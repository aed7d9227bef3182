"""Preconditioned Hamiltonian Monte Carlo over the differentiable posterior.

Beyond-reference sampler: the reference's posterior (numpy + LAPACK,
src/mcmc.py:188-222) is not differentiable, so gradient-based kernels are
impossible there.  Here the fused ``Chain.posterior_with_state()`` program
is a pure JAX function, so exact gradients cost ~2-3x a forward evaluation
and HMC becomes available as a third ensemble-style option.

Design (standard windowed adaptation, all phases compiled ``lax.scan``s):

- **Reparametrization**: box-constrained parameters are mapped to
  unbounded space through ``x = lo + width * sigmoid(z)`` with the log-
  Jacobian folded into the target, so leapfrog trajectories never leave the
  prior box (pass ``lo``/``hi``; omit for an unbounded target).
- **Preconditioning**: an affine map ``z = chol @ u + mu`` whitens the
  posterior (dense mass matrix).  Phase A runs identity-metric warmup and
  estimates ``(mu, chol)`` from its second-half samples across all walkers;
  phase B re-adapts the step size under the new metric.
- **Step size**: dual averaging (Nesterov; the NUTS schedule with
  ``gamma=0.05, t0=10, kappa=0.75``) toward ``target_accept``, plus a
  +-10% per-walker step-size jitter to break resonances.
- **Leapfrog length** ``n_leapfrog`` is static for XLA: either fixed by
  the caller, or calibrated per posterior with ``n_leapfrog="auto"`` — a
  compiled probe phase after warmup runs walker ``w`` at the rotating
  stratified length ``1 + ((w + step) mod l_max)`` (masked iterations,
  one compile) and production uses the ``L`` maximizing the AR(1) mixing
  score ``(1 - rho_1) / ((1 + rho_1) L)`` ≈ 1/(tau·L), i.e. effective
  samples per gradient, with ``rho_1`` the per-L-group lag-1
  autocorrelation (worst coordinate).  Criterion chosen by measurement
  on the flagship posterior: this score reproduces the fixed-L sweep's
  true ESS/s ranking (8 > 6 > 10 > 5 > 4), while ESJD-per-gradient is
  biased short (picked L=5, −35% ESS/s: jump distance saturates before
  decorrelation completes) and raw binned ChEES is far too noisy at
  realistic probe budgets (a 4th-moment statistic; argmax jumped 14→16
  between repeat probes, each a ≥2x ESS/s loss).

Measured on the flagship 544-observable posterior (TPU v5e, 1024 walkers):
``n_leapfrog=8`` reaches tau ~ 1.9 at acceptance 0.80 -- near-iid draws --
for **4054 ESS/sec** charging the full warmup wall clock, vs 2390 for the
DE ensemble move.  The honest gap is even larger: ensemble-move tau keeps
growing with the measurement window on this posterior (22.5/38.9/61.3/86.5
at 256/512/1024/2048 steps -- the windowed estimate never converges), so
DE's number is an upper bound while HMC's tau is converged (window >>
50 tau).  Gradients cost ~3x a forward pass; the 30x+ tau reduction wins.
"""

from __future__ import annotations

import logging
from functools import lru_cache, partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

logger = logging.getLogger(__name__)


class HMCResult(NamedTuple):
    chain: jnp.ndarray        # (nwalkers, nsteps, ndim) in x-space
    log_prob: jnp.ndarray     # (nwalkers, nsteps) x-space log posterior
    acceptance: jnp.ndarray   # (nsteps,) mean accept probability per step
    final_state: jnp.ndarray  # (nwalkers, ndim) x-space
    step_size: float          # adapted leapfrog step size
    precond_chol: np.ndarray  # (ndim, ndim) adapted metric Cholesky
    precond_mu: np.ndarray    # (ndim,)
    n_leapfrog: int           # production trajectory length (as calibrated)
    warmup_steps: int = 0     # adaptation steps actually run (both phases
                              # combined; 0 for a warm start, excludes the
                              # n_leapfrog="auto" probe)
    scheme: str = "mh"        # production kernel actually run (the
                              # resolved branch under scheme="auto")
    persist: float = 0.0      # production momentum persistence actually run


# scheme="auto" resolution: windowed trajectory sampling with Horowitz
# persistent momentum is the measured-best production kernel on the
# flagship posterior (~8-10% over endpoint MH at persist=0.7), but
# persistence only pays when acceptance is high (a rejection REVERSES the
# persistent momentum, so at low acceptance the ballistic drift never
# builds up).  The adapted acceptance decides the branch.
_AUTO_ACC_MIN = 0.75
_AUTO_PERSIST = 0.7


@lru_cache(maxsize=64)
def _stateless_wrapper(fn):
    """Stable (state, x) adapter for a state-free log-prob function."""
    return lambda _s, x: fn(x)


def _u_to_x(u, tf, bounded):
    """Whitened-unbounded u -> parameter x, plus log|dx/du| (per sample)."""
    z = u @ tf["chol"].T + tf["mu"]
    if not bounded:
        return z, jnp.zeros(u.shape[:-1], u.dtype)
    x = tf["lo"] + tf["width"] * jax.nn.sigmoid(z)
    logjac = jnp.sum(
        jnp.log(tf["width"]) - jax.nn.softplus(z) - jax.nn.softplus(-z),
        axis=-1,
    )
    return x, logjac


def _x_to_u(x, lo, width, mu, chol):
    """Host-side inverse of :func:`_u_to_x` (numpy; used for starts)."""
    from .smc import _to_unbounded_np  # shared clipped-logit transform

    x = np.asarray(x, dtype=np.float64)
    z = _to_unbounded_np(x, lo, lo + width) if lo is not None else x
    return np.linalg.solve(chol, (z - mu).T).T


@partial(
    jax.jit,
    static_argnames=(
        "log_prob_fn", "nsteps", "n_leapfrog", "adapt", "bounded",
        "traj_jitter", "probe", "return_da",
    ),
)
def _hmc_scan(
    log_prob_fn,
    state,
    tf,
    u0,
    key,
    log_eps0,
    *,
    nsteps: int,
    n_leapfrog: int,
    adapt: bool,
    bounded: bool,
    target_accept: float = 0.8,
    traj_jitter: int = 0,
    probe: bool = False,
    da0=None,
    return_da: bool = False,
):
    """One compiled HMC phase: ``nsteps`` steps from ``u0``.

    Returns (chain_x, lp_x, accept_probs, u_final, log_eps_bar).  With
    ``adapt`` the step size follows dual averaging and the returned
    ``log_eps_bar`` is the averaged estimate; otherwise eps stays fixed.

    ``da0``: optional dual-averaging state ``(hbar, log_eps, log_eps_bar,
    t)`` carried over from a previous chunk, so adaptation can be split
    into short compiled chunks with host-side convergence checks between
    them (``warmup="auto"`` in :func:`run_hmc`).  ``log_eps0`` stays the
    ORIGINAL anchor: the dual-averaging shrinkage target ``mu_da`` is
    derived from it and must not move between chunks.  With ``return_da``
    the final element of the result is the full state tuple instead of
    ``log_eps_bar``.

    With ``probe`` step ``s`` runs walker ``w`` at the rotating stratified
    trajectory length ``1 + ((w + s) mod n_leapfrog)`` and the outputs
    become ``(us, accept_probs, u_final, log_eps_bar)`` with ``us`` the
    (nsteps, nwalkers, ndim) u-space chain: every transition is
    attributable to exactly one length, and the per-length lag-1
    autocorrelation drives host-side trajectory-length selection (see
    :func:`_select_leapfrog`).
    """

    def logp_u(u):
        x, logjac = _u_to_x(u, tf, bounded)
        return log_prob_fn(state, x), logjac

    def value_and_grad_u(u):
        def f(uu):
            lp_x, logjac = logp_u(uu)
            total = lp_x + logjac
            return jnp.sum(total), (total, lp_x)

        (_, (lp_u, lp_x)), g = jax.value_and_grad(f, has_aux=True)(u)
        # a -inf target (possible only in the unbounded case) has no usable
        # gradient; zero it so leapfrog arithmetic stays finite
        g = jnp.where(jnp.isfinite(lp_u)[:, None], g, 0.0)
        return lp_u, lp_x, g

    mu_da = log_eps0 + jnp.log(10.0)
    lf_idx = jnp.arange(n_leapfrog)

    def step(carry, inp):
        key, s = inp
        u, lp_u, lp_x, g, hbar, log_eps, log_eps_bar, t = carry
        m = u.shape[0]
        k_p, k_j, k_L, k_a = jax.random.split(key, 4)
        eps = jnp.exp(log_eps)
        e = eps * jax.random.uniform(k_j, (m, 1), u.dtype, 0.9, 1.1)
        p0 = jax.random.normal(k_p, u.shape, u.dtype)
        p = p0 + 0.5 * e * g

        # Leapfrog coefficient schedule: position/momentum updates active
        # for iterations < L, half momentum kick at iteration L - 1.  With
        # traj_jitter > 0 the trajectory length L is drawn PER WALKER from
        # {n_leapfrog - traj_jitter, ..., n_leapfrog} each step: combined
        # with the +-10% step-size jitter this breaks the periodic-orbit
        # resonances a fixed eps*L can hit (a near-Gaussian target with
        # eps*L ~ 2pi*sigma returns proposals to their start).  The scan
        # still runs n_leapfrog iterations (static shapes) -- masked
        # iterations recompute the same point, so wall clock is unchanged.
        if probe:
            # rotating stratified lengths: step s runs walker w at
            # L = 1 + ((w + s) mod n_leapfrog), so every length is probed
            # with ANY walker count (a fixed per-walker assignment would
            # leave lengths > nwalkers unmeasured) and each transition is
            # attributable to exactly one length for the host-side lag-1
            # autocorrelation binning in _select_leapfrog
            L = 1 + (jnp.arange(m) + s) % n_leapfrog
        elif traj_jitter > 0:
            # clamp so L >= 1 always: jitter >= n_leapfrog would draw
            # zero-length trajectories whose MH test runs on a bogus
            # energy difference from the unconditional initial half-kick
            lo_L = max(n_leapfrog - traj_jitter, 1)
            L = jax.random.randint(k_L, (m,), lo_L, n_leapfrog + 1)
        else:
            L = None
        if L is None:
            active = jnp.ones((n_leapfrog, 1), u.dtype)
            coeff = jnp.where(lf_idx == n_leapfrog - 1, 0.5, 1.0)[:, None]
        else:
            active = (lf_idx[:, None] < L[None, :]).astype(u.dtype)
            coeff = (
                jnp.where(lf_idx[:, None] == L[None, :] - 1, 0.5, 1.0) * active
            )

        def leap(c, ac):
            act, cf = ac
            uu, pp, _, _, _ = c
            uu = uu + act[:, None] * e * pp
            lpn_u, lpn_x, gn = value_and_grad_u(uu)
            pp = pp + cf[:, None] * e * gn
            return (uu, pp, lpn_u, lpn_x, gn), None

        (u1, p1, lp1_u, lp1_x, g1), _ = lax.scan(
            leap, (u, p, lp_u, lp_x, g), (active, coeff)
        )
        dh = (lp1_u - 0.5 * jnp.sum(p1**2, axis=1)) - (
            lp_u - 0.5 * jnp.sum(p0**2, axis=1)
        )
        dh = jnp.where(jnp.isnan(dh), -jnp.inf, dh)
        acc_prob = jnp.mean(jnp.exp(jnp.minimum(dh, 0.0)))
        accept = jnp.log(jax.random.uniform(k_a, (m,), u.dtype)) < dh
        u = jnp.where(accept[:, None], u1, u)
        lp_u = jnp.where(accept, lp1_u, lp_u)
        lp_x = jnp.where(accept, lp1_x, lp_x)
        g = jnp.where(accept[:, None], g1, g)

        if adapt:
            t = t + 1.0
            hbar = (1 - 1 / (t + 10.0)) * hbar + (
                target_accept - acc_prob
            ) / (t + 10.0)
            log_eps = mu_da - jnp.sqrt(t) / 0.05 * hbar
            w = t**-0.75
            log_eps_bar = w * log_eps + (1 - w) * log_eps_bar

        if probe:
            # record the raw u-space positions: rejections repeat the
            # previous point, so trajectories that tank acceptance show up
            # as HIGH lag-1 autocorrelation and are penalized by the same
            # statistic that measures slow mixing
            out = (u, acc_prob)
        else:
            x, _ = _u_to_x(u, tf, bounded)
            out = (x, lp_x, acc_prob)
        return (u, lp_u, lp_x, g, hbar, log_eps, log_eps_bar, t), out

    lp0_u, lp0_x, g0 = value_and_grad_u(u0)
    zero = jnp.asarray(0.0, u0.dtype)
    if da0 is None:
        hbar0, log_eps_c, log_eps_bar0, t0 = zero, log_eps0, log_eps0, zero
    else:
        hbar0, log_eps_c, log_eps_bar0, t0 = da0
    carry0 = (u0, lp0_u, lp0_x, g0, hbar0, log_eps_c, log_eps_bar0, t0)
    keys = jax.random.split(key, nsteps)
    (uf, _, _, _, hbar_f, log_eps_f, log_eps_bar, t_f), outs = lax.scan(
        step, carry0, (keys, jnp.arange(nsteps))
    )
    if return_da:
        return (*outs, uf, (hbar_f, log_eps_f, log_eps_bar, t_f))
    return (*outs, uf, log_eps_bar)


@partial(
    jax.jit,
    static_argnames=(
        "log_prob_fn", "nsteps", "n_leapfrog", "bounded", "window",
        "persist",
    ),
)
def _hmc_scan_trajectory(
    log_prob_fn,
    state,
    tf,
    u0,
    key,
    log_eps,
    *,
    nsteps: int,
    n_leapfrog: int,
    bounded: bool,
    window: int = 0,
    persist: float = 0.0,
):
    """Trajectory-sampling HMC production phase (multinomial / windowed).

    Both schemes place the current point at a random offset inside an
    ``L``-step leapfrog trajectory (``s`` steps BACKWARD, ``L - s`` forward
    -- one gradient per iteration either way, so the cost equals classic
    HMC) and pick the next state by Boltzmann weight
    ``exp(lp_u - |p|^2 / 2)`` instead of accept/rejecting the endpoint:

    - ``window == 0`` (multinomial): ``s ~ U{0..L}`` and the next state is
      Boltzmann-sampled from ALL ``L + 1`` states (Stan's within-trajectory
      scheme, Betancourt 2017 app. A.2).  Never rejects, but the selection
      is distance-agnostic: measured on the flagship posterior the average
      |move| halves and tau went 1.89 -> 4.7, so this exists as a
      correctness baseline, not the production pick.
    - ``window = W > 0`` (Neal 1994 windowed HMC): ``s ~ U{0..W-1}``, so
      the current state sits in the W-state REJECT window at the
      trajectory's start; the W-state ACCEPT window at the far end is
      accepted with probability ``min(1, sum_A w / sum_R w)`` and the next
      state is Boltzmann-sampled WITHIN the chosen window.  Accepted moves
      stay ~L steps long (the multinomial failure mode is gone), window
      *sums* fluctuate less than endpoint weights (higher acceptance than
      classic HMC at the same step size), and a rejection resamples within
      the start window instead of exactly repeating the current point.
      Requires ``2 W <= L + 1`` (disjoint windows).

    Detailed balance: the windowed kernel is Neal's scheme with the offset
    drawn uniformly over the reject window; the multinomial kernel is its
    degenerate full-trajectory limit.  Selection within a window uses the
    Gumbel-max trick streamed over the scan (no trajectory buffer).

    ``persist`` (windowed only): partial momentum refresh
    ``p <- persist * p + sqrt(1 - persist^2) * xi`` between steps (Horowitz
    1991 generalized HMC; the acceptance-window construction was built for
    exactly this pairing, Neal 1994 sec. 4).  The selected state carries
    its trajectory momentum onward -- accept-window states keep the
    forward momentum ``+P_t``, reject-window states the reversed ``-P_t``
    (the flip modified detailed balance requires: backward-leg candidates
    already store ``-P_t``; the start and any forward-leg reject
    candidates are negated at update time).  ``persist=0`` is a full
    refresh, i.e. exactly the non-persistent kernel.

    Adaptation still runs under the Metropolis scheme (:func:`_hmc_scan`)
    -- dual averaging needs its acceptance statistic -- so this phase takes
    the adapted ``tf``/``log_eps`` as fixed inputs.  The reported per-step
    statistic is the mean window acceptance probability (windowed) or the
    trajectory-averaged ``min(1, exp(dH))`` (multinomial).

    Returns ``(chain_x (nsteps, m, d), lp_x (nsteps, m), accept_stats
    (nsteps,), u_final)``.
    """
    if window < 0 or 2 * window > n_leapfrog + 1:
        raise ValueError(
            f"window must satisfy 0 <= 2*window <= n_leapfrog + 1 "
            f"(got window={window}, n_leapfrog={n_leapfrog})"
        )
    if not 0.0 <= persist < 1.0:
        raise ValueError(f"persist must be in [0, 1), got {persist}")
    if persist > 0.0 and window == 0:
        # the multinomial kernel's momentum bookkeeping under persistence
        # differs (no disjoint accept/reject windows to key the flip on);
        # it is a correctness baseline, so persistence is windowed-only
        raise ValueError("persist > 0 requires the windowed scheme")

    def value_and_grad_u(u):
        def f(uu):
            x, logjac = _u_to_x(uu, tf, bounded)
            lp_x = log_prob_fn(state, x)
            total = lp_x + logjac
            return jnp.sum(total), (total, lp_x)

        (_, (lp_u, lp_x)), g = jax.value_and_grad(f, has_aux=True)(u)
        g = jnp.where(jnp.isfinite(lp_u)[:, None], g, 0.0)
        return lp_u, lp_x, g

    eps = jnp.exp(log_eps)
    m_walk = u0.shape[0]
    L = n_leapfrog
    neg_inf = -jnp.inf

    def step(carry, key):
        u, p_prev, lp_u, lp_x, g = carry
        k_p, k_j, k_s, k_g, k_acc = jax.random.split(key, 5)
        e = eps * jax.random.uniform(k_j, (m_walk, 1), u.dtype, 0.9, 1.1)
        xi = jax.random.normal(k_p, u.shape, u.dtype)
        if persist > 0.0:
            # AR(1) refresh keeps N(0, I) invariant and is self-adjoint
            # under it, so composing it with the flip-balanced trajectory
            # kernel below preserves the joint target.  float() keeps the
            # coefficient weakly typed: a bare np.sqrt scalar is STRONG
            # f64 and would silently promote f32 walkers under x64.
            p0 = persist * p_prev + float(np.sqrt(1.0 - persist**2)) * xi
        else:
            p0 = xi
        s_hi = (L + 1) if window == 0 else window
        s = jax.random.randint(k_s, (m_walk,), 0, s_hi)

        def log_w(lp, p):
            lw = lp - 0.5 * jnp.sum(p**2, axis=1)
            return jnp.where(jnp.isnan(lw), neg_inf, lw)

        def gumbel(i):
            return -jnp.log(-jnp.log(
                jax.random.uniform(
                    jax.random.fold_in(k_g, i), (m_walk,), u.dtype,
                    jnp.finfo(u.dtype).tiny, 1.0,
                )
            ))

        def in_r(t):
            # reject window = first W trajectory slots (all slots if W == 0)
            if window == 0:
                return jnp.ones_like(t, bool)
            return t <= window - 1

        def in_a(t):
            # accept window = last W trajectory slots (all slots if W == 0)
            if window == 0:
                return jnp.ones_like(t, bool)
            return t >= L - window + 1

        def upd_best(best, member, lw, score, un, lpn_u, lpn_x, gn, pn):
            take = member & (score > best[0])
            return (
                jnp.where(take, score, best[0]),
                jnp.where(take[:, None], un, best[1]),
                jnp.where(take, lpn_u, best[2]),
                jnp.where(take, lpn_x, best[3]),
                jnp.where(take[:, None], gn, best[4]),
                jnp.where(take[:, None], pn, best[5]),
            )

        def add_lse(lse, member, lw):
            return jnp.logaddexp(lse, jnp.where(member, lw, neg_inf))

        # start state sits at trajectory slot t = s
        lw0 = log_w(lp_u, p0)
        g0_score = lw0 + gumbel(0)
        t0 = s
        none_score = jnp.full((m_walk,), neg_inf, u.dtype)
        empty = (none_score, u, lp_u, lp_x, g, p0)
        # reject-window candidates carry the REVERSED momentum (see the
        # persistence note in the docstring): for the start state that is
        # -p0; accept-window candidates keep the forward momentum
        best_r = upd_best(
            empty, in_r(t0), lw0, g0_score, u, lp_u, lp_x, g, -p0
        )
        best_a = upd_best(
            empty, in_a(t0), lw0, g0_score, u, lp_u, lp_x, g, p0
        )
        lse_r = jnp.where(in_r(t0), lw0, neg_inf)
        lse_a = jnp.where(in_a(t0), lw0, neg_inf)

        def leap_kdk(u_c, p_c, g_c, e_c):
            ph = p_c + 0.5 * e_c * g_c
            un = u_c + e_c * ph
            lpn_u, lpn_x, gn = value_and_grad_u(un)
            pn = ph + 0.5 * e_c * gn
            return un, pn, lpn_u, lpn_x, gn

        def body(inner, i):
            back_st, fwd_st, best_r, best_a, lse_r, lse_a = inner
            back1 = i < s          # (m,) walker integrates backward this iter
            back2 = back1[:, None]

            def sel(a, b):
                return jnp.where(back2 if a.ndim == 2 else back1, a, b)

            # one gradient per iteration: advance whichever side is active
            u_c = sel(back_st[0], fwd_st[0])
            p_c = sel(back_st[1], fwd_st[1])
            g_c = sel(back_st[2], fwd_st[2])
            un, pn, lpn_u, lpn_x, gn = leap_kdk(u_c, p_c, g_c, e)

            new_vals = (un, pn, gn, lpn_u, lpn_x)
            new_back = tuple(
                sel(n, o) for n, o in zip(new_vals, back_st)
            )
            new_fwd = tuple(
                jnp.where(back2 if n.ndim == 2 else back1, o, n)
                for n, o in zip(new_vals, fwd_st)
            )
            # trajectory slot of the state just produced: backward step
            # i+1 <= s lands at t = s - (i+1); forward step lands at t = i+1
            t = jnp.where(back1, s - (i + 1), i + 1)
            lw = log_w(lpn_u, pn)
            score = lw + gumbel(i + 1)
            # reject-window momentum is the reversed -P_t: backward-leg
            # states already integrated with -p0 so their pn IS -P_t;
            # forward-leg states (slot t in (s, W-1], possible when s < W-1)
            # are negated here
            best_r = upd_best(best_r, in_r(t), lw, score, un, lpn_u, lpn_x,
                              gn, jnp.where(back2, pn, -pn))
            best_a = upd_best(best_a, in_a(t), lw, score, un, lpn_u, lpn_x,
                              gn, pn)
            lse_r = add_lse(lse_r, in_r(t), lw)
            lse_a = add_lse(lse_a, in_a(t), lw)
            return (new_back, new_fwd, best_r, best_a, lse_r, lse_a), None

        back0 = (u, -p0, g, lp_u, lp_x)
        fwd0 = (u, p0, g, lp_u, lp_x)
        (_, _, best_r, best_a, lse_r, lse_a), _ = lax.scan(
            body, (back0, fwd0, best_r, best_a, lse_r, lse_a),
            jnp.arange(L),
        )
        if window == 0:
            # multinomial: both windows are the full trajectory; best_a IS
            # the Boltzmann draw over all L + 1 states
            chosen = best_a
            acc_stat = jnp.mean(
                jnp.exp(jnp.minimum(lse_a - jnp.log(L + 1.0) - lw0, 0.0))
            )
        else:
            log_acc = jnp.minimum(lse_a - lse_r, 0.0)
            accept = (
                jnp.log(jax.random.uniform(
                    k_acc, (m_walk,), u.dtype, jnp.finfo(u.dtype).tiny, 1.0,
                )) < log_acc
            )
            chosen = tuple(
                jnp.where(accept[:, None] if a.ndim == 2 else accept, a, r)
                for a, r in zip(best_a, best_r)
            )
            acc_stat = jnp.mean(jnp.exp(log_acc))
        _, u, lp_u, lp_x, g, p_next = chosen
        x, _ = _u_to_x(u, tf, bounded)
        return (u, p_next, lp_u, lp_x, g), (x, lp_x, acc_stat)

    lp0_u, lp0_x, g0 = value_and_grad_u(u0)
    # fold_in (large constant, same trick as the auto-L probe) rather than
    # a wider split keeps the persist=0 key stream byte-identical to the
    # pre-persistence kernel; p_init is stationary N(0, I) so persistent
    # chains start with no kinetic-energy transient
    p_init = jax.random.normal(
        jax.random.fold_in(key, 0x50455253), u0.shape, u0.dtype
    )
    keys = jax.random.split(key, nsteps)
    (uf, *_), (xs, lps, accs) = lax.scan(
        step, (u0, p_init, lp0_u, lp0_x, g0), keys
    )
    return xs, lps, accs, uf


def _select_leapfrog(us: np.ndarray, l_max: int) -> int:
    """Pick the trajectory length maximizing effective samples per gradient.

    ``us``: probe-phase u-space chain (nsteps, nwalkers, ndim), where the
    transition into ``us[s]`` ran walker ``w`` at the rotating stratified
    length ``1 + ((w + s) mod l_max)`` — every length is probed with any
    walker count.  For each length the per-coordinate lag-1
    autocorrelation ``rho_1`` is estimated (pooled over all transition
    pairs attributed to that length) and the length is scored by the
    AR(1) mixing rate per unit compute on its WORST coordinate::

        score(L) = min_d (1 - rho_1[d]) / ((1 + rho_1[d]) * L)

    ``(1 - rho)/(1 + rho)`` is 1/tau for an AR(1) chain, so the score is
    effective samples per gradient evaluation (each leapfrog iteration
    costs one gradient).  Criterion chosen by measurement on the flagship
    posterior: this score reproduces the fixed-L sweep's true ESS/s
    ranking (8 > 6 > 10 > 5 > 4), while ESJD-per-gradient is biased short
    (jump distance saturates at L=5 where ESS/s still grows to L=8) and
    binned ChEES is a 4th-moment statistic far too noisy at realistic
    probe budgets (repeat probes picked 14 then 16).  Rejections repeat
    the previous point, so lengths that tank acceptance score poorly via
    high rho_1.  Groups with fewer than 8 lag pairs are ignored; if every
    group is starved the mid-range fallback ``max(l_max // 2, 1)`` is
    returned.
    """
    us = np.asarray(us, np.float64)
    nsteps, nwalkers, _ = us.shape
    c = us - us.mean(axis=(0, 1))  # one stationary marginal for all lengths
    a, b = c[:-1], c[1:]
    # transition us[s-1] -> us[s] was made by scan step s, whose length for
    # walker w is 1 + ((w + s) mod l_max)
    grp = (
        np.arange(nwalkers)[None, :] + np.arange(1, nsteps)[:, None]
    ) % l_max
    score = np.full(l_max + 1, -np.inf)
    for L in range(1, l_max + 1):
        mask = grp == L - 1  # (nsteps - 1, nwalkers)
        if mask.sum() < 8:
            continue
        m3 = mask[:, :, None]
        num = np.sum(a * b * m3, axis=(0, 1))
        den = np.sqrt(
            np.sum(a**2 * m3, axis=(0, 1)) * np.sum(b**2 * m3, axis=(0, 1))
        )
        rho = num / np.maximum(den, 1e-300)
        rho = np.clip(rho, -0.999, 0.999)
        score[L] = np.min((1.0 - rho) / ((1.0 + rho) * L))
    if not np.isfinite(score).any():
        return max(l_max // 2, 1)
    return int(np.argmax(score))


# warmup="auto" stopping rule: adapt in short compiled chunks and stop as
# soon as the dual-averaged step size has stabilized AND acceptance sits on
# target.  The chunk program (nsteps=16) compiles once and is reused by both
# adaptation phases and every chunk.
_WARMUP_CHUNK = 16
_WARMUP_MIN_CHUNKS = 2       # never decide on fewer than 32 steps
_WARMUP_MAX_CHUNKS = 16      # hard cap: 256 steps per phase
_WARMUP_EPS_TOL = 0.02       # |delta log_eps_bar| across a chunk
_WARMUP_ACC_TOL = 0.10       # |acceptance - target| over the last chunk


def _adaptive_phase(
    log_prob_fn, state, tf, u0, key, log_eps_anchor, *,
    n_leapfrog, bounded, target_accept, traj_jitter,
):
    """One warmup phase with an automatic stopping rule (``warmup="auto"``).

    Runs dual-averaging adaptation in compiled ``_WARMUP_CHUNK``-step
    chunks, carrying the full DA state across chunks, and stops once the
    averaged log step size moved less than ``_WARMUP_EPS_TOL`` over the
    last chunk and the chunk's mean acceptance is within
    ``_WARMUP_ACC_TOL`` of ``target_accept`` (at least
    ``_WARMUP_MIN_CHUNKS`` chunks, at most ``_WARMUP_MAX_CHUNKS``).

    Returns ``(xs_all, u_final, log_eps_bar, nsteps_done, last_acc)`` with
    ``xs_all`` the full (nsteps_done, nwalkers, ndim) x-space sample stack
    (the metric estimate in :func:`run_hmc` uses its second half) and
    ``last_acc`` the final chunk's mean acceptance (drives the
    ``scheme="auto"`` branch choice).
    """
    xs_chunks = []
    u, da = u0, None
    prev_bar = None
    bar = float(np.asarray(log_eps_anchor))
    stopped = False
    for c in range(_WARMUP_MAX_CHUNKS):
        k_c = jax.random.fold_in(key, c)
        xs, _, accs, u, da = _hmc_scan(
            log_prob_fn, state, tf, u, k_c, log_eps_anchor,
            nsteps=_WARMUP_CHUNK, n_leapfrog=n_leapfrog, adapt=True,
            bounded=bounded, target_accept=target_accept,
            traj_jitter=traj_jitter, da0=da, return_da=True,
        )
        xs_chunks.append(np.asarray(xs))
        bar = float(np.asarray(da[2]))
        acc = float(np.mean(np.asarray(accs)))
        delta_bar = (
            abs(bar - prev_bar) if prev_bar is not None else float("nan")
        )
        if (
            c + 1 >= _WARMUP_MIN_CHUNKS
            and prev_bar is not None
            and delta_bar < _WARMUP_EPS_TOL
            and abs(acc - target_accept) < _WARMUP_ACC_TOL
        ):
            stopped = True
            break
        prev_bar = bar
    nsteps_done = len(xs_chunks) * _WARMUP_CHUNK
    logger.info(
        "HMC auto warmup phase: %d steps (eps_bar %.4f, last-chunk "
        "acceptance %.3f)", nsteps_done, np.exp(bar), acc,
    )
    if not stopped:
        # the stopping rule never fired: adaptation hit the hard cap with
        # the step size still drifting or acceptance off target -- surface
        # it, a silently poorly-adapted run shows up only as inflated tau
        logger.warning(
            "HMC auto warmup phase exhausted the %d-step cap without "
            "stabilizing (|delta log eps_bar| %.4f vs tol %.2g, acceptance "
            "%.3f vs target %.2f +- %.2f); production may be poorly adapted "
            "-- consider a fixed, larger warmup.",
            _WARMUP_MAX_CHUNKS * _WARMUP_CHUNK,
            delta_bar, _WARMUP_EPS_TOL, acc, target_accept, _WARMUP_ACC_TOL,
        )
    return (np.concatenate(xs_chunks, axis=0), u, jnp.asarray(da[2]),
            nsteps_done, acc)


def run_hmc(
    log_prob_fn: Callable[..., jnp.ndarray],
    x0: jnp.ndarray,
    nsteps: int,
    key: jax.Array,
    *,
    state=None,
    lo=None,
    hi=None,
    n_leapfrog: int | str = 8,
    warmup: int | str = 128,
    warmup_leapfrog: int | None = None,
    warmup_walkers: int | None = None,
    eps0: float = 0.1,
    target_accept: float = 0.8,
    traj_jitter: int = 1,
    l_max: int = 16,
    probe_steps: int = 64,
    mesh=None,
    warm_start: HMCResult | None = None,
    scheme: str = "mh",
    window: int | None = None,
    persist: float = 0.0,
) -> HMCResult:
    """Run preconditioned HMC: warmup (metric + step size), then ``nsteps``
    production steps from walker positions ``x0`` (nwalkers, ndim).

    ``log_prob_fn(state, x)`` maps (m, ndim) -> (m,) and must be traceable
    and differentiable; pass posterior arrays via ``state`` (never closure
    constants -- see :func:`..samplers.ensemble.run_ensemble`).  ``lo``/
    ``hi`` activate the bounded (logit) reparametrization; production
    samples are returned in x-space.

    ``traj_jitter``: per-walker trajectory lengths are drawn uniformly from
    ``{max(n_leapfrog - traj_jitter, 1), ..., n_leapfrog}`` each step,
    breaking periodic-orbit resonances a fixed length can hit (wall clock
    unchanged -- see :func:`_hmc_scan`).  ``traj_jitter=0`` restores fixed
    lengths.

    ``warmup_leapfrog``: trajectory length for the two adaptation phases;
    defaults to ``max(n_leapfrog // 2, 1)``.  Adaptation needs acceptance
    statistics and roughly-stationary samples, not decorrelated ones, so
    half-length warmup matches full-length adaptation quality (measured on
    the flagship: identical tau and eps transfer) at lower gradient cost;
    quarter-length is past the cliff (eps over-adapts ~20%, tau +8%).
    Ignored under ``n_leapfrog="auto"`` (eps must transfer up to
    ``l_max``-long probe trajectories there).

    ``n_leapfrog="auto"`` calibrates the production trajectory length to
    the posterior: warmup runs at ``max(l_max // 2, 1)``, then a compiled
    probe of ``probe_steps`` steps runs walker ``w`` at the rotating
    stratified length ``1 + ((w + step) mod l_max)`` and production uses
    the ``L`` whose transitions maximize the AR(1) mixing score
    ``(1 - rho_1)/((1 + rho_1) L)`` — effective samples per gradient (see
    :func:`_select_leapfrog`; the chosen value is reported as
    ``result.n_leapfrog``).  The probe doubles as extra burn-in; its cost
    is ``probe_steps * l_max`` gradient evaluations.  Every length is
    probed with any walker count; more walkers or probe steps sharpen the
    per-length rho_1 estimate (at 32 probe steps the flagship pick
    wobbled between the top-two lengths, a <= 10% ESS/s spread; the
    64-step default resolves it for ~1.5 s extra probe).

    ``mesh``: optional 1-D device mesh; walkers are sharded over it and the
    likelihood state is replicated (see :mod:`..parallel.mesh`).

    ``warmup_walkers``: run the adaptation phases (and the ``"auto"``
    probe) on only the first ``warmup_walkers`` walkers instead of all of
    them.  Adaptation needs cross-walker acceptance statistics and a
    metric estimate, not the full production batch -- a few hundred
    walkers x the phase lengths give thousands of samples for the
    ndim x ndim metric -- so a subset cuts the warmup gradient bill
    proportionally (the flagship headline charges ~10% of its wall to
    warmup at the full 1024).  Production starts from the warmed subset
    tiled up to ``nwalkers`` (``uf[i mod warmup_walkers]``): duplicated
    starts diverge on the first step (per-walker RNG streams) and
    decorrelate within ~tau production steps, which the converged-window
    tau estimator absorbs.  ``None`` (default) keeps the full batch;
    ignored with ``warm_start`` (no warmup runs).  Requires
    ``1 <= warmup_walkers <= nwalkers`` (and mesh divisibility when
    sharded).

    ``warmup="auto"`` replaces the fixed per-phase step count with an
    automatic stopping rule: each adaptation phase runs in compiled
    16-step chunks and ends as soon as the dual-averaged step size has
    stabilized (|delta log eps_bar| < 0.02 over a chunk) with acceptance
    within 0.1 of ``target_accept`` — at least 32 and at most 256 steps
    per phase.  On an easy posterior this stops near the minimum budget;
    on a hard one it keeps adapting, so no hand-picked count is needed.

    ``warm_start``: an :class:`HMCResult` from a previous run on the SAME
    posterior -- its adapted metric ``(precond_mu, precond_chol)``, step
    size, and calibrated ``n_leapfrog`` are reused and ALL adaptation
    phases (metric, step size, and the ``"auto"`` probe) are skipped:
    production starts immediately from ``x0`` (typically the previous
    ``result.final_state``).  Continuing a converged run this way costs
    zero warmup gradients.  An explicit integer ``n_leapfrog`` overrides
    the warm-started length; ``"auto"`` reuses it.

    ``scheme``: the PRODUCTION transition kernel (see
    :func:`_hmc_scan_trajectory`; warmup always adapts under ``"mh"``,
    whose acceptance statistic dual averaging needs).  ``"auto"`` picks
    the kernel from the adapted acceptance: at >= 0.75 it runs the
    measured-best ``"windowed"`` kernel with Horowitz persistent momentum
    (``persist=0.7`` unless the caller set a nonzero value), else it
    falls back to plain endpoint MH (persistence loses at low acceptance
    -- each rejection reverses the persistent momentum).  The resolved
    branch is reported as ``result.scheme``/``result.persist``.  ``"mh"``
    is classic HMC -- integrate ``n_leapfrog`` steps forward, Metropolis
    accept/reject the endpoint.  ``"windowed"`` is Neal (1994) windowed
    HMC: accept/reject the ``window``-state far END of the trajectory
    against its start window by summed Boltzmann weight, then sample
    within the chosen window -- same gradient cost, higher acceptance
    (sums fluctuate less than endpoints), and rejections resample the
    start window instead of exactly repeating the current point.
    ``window`` defaults to ``min(2, (n_leapfrog + 1) // 2)`` -- on the
    flagship posterior W=2 measured ~8% more ESS/s than both classic MH
    and W=3 (selection inside a wider window drifts back from the
    endpoint, shortening moves: W=3 tau 2.00 vs W=2 tau 1.78) -- and must
    satisfy ``2 * window <= n_leapfrog + 1``.  ``"multinomial"``
    Boltzmann-samples from ALL trajectory states (Stan's within-trajectory
    scheme) -- kept as a baseline: its distance-agnostic selection
    measurably halves the move length (flagship tau 1.89 -> 4.7), so
    prefer ``"windowed"``.

    ``persist`` (windowed scheme only): partial momentum refresh
    ``p <- persist * p + sqrt(1 - persist^2) * xi`` between production
    steps (Horowitz 1991 generalized HMC).  Successive trajectories keep
    drifting the same way instead of taking a fresh random direction, so
    exploration becomes ballistic over ~1/(1-persist) trajectories;
    rejections reverse the momentum (the windowed scheme's low rejection
    rate is what makes persistence pay -- Neal 1994 built acceptance
    windows for exactly this pairing).  ``0.0`` (default) is the classic
    full refresh.
    """
    if scheme not in ("mh", "multinomial", "windowed", "auto"):
        raise ValueError(
            f"scheme must be 'auto', 'mh', 'windowed', or 'multinomial', "
            f"got {scheme!r}"
        )
    if not 0.0 <= persist < 1.0:
        raise ValueError(f"persist must be in [0, 1), got {persist}")
    if persist > 0.0 and scheme not in ("windowed", "auto"):
        raise ValueError("persist > 0 requires scheme='windowed' (or 'auto')")
    # resolve/validate the window BEFORE any warmup runs: a bad window must
    # not cost the caller two adaptation phases before raising.  Under
    # scheme="auto" an EXPLICIT window is validated too -- auto may
    # resolve to the windowed kernel after warmup, and a nonsense window
    # must not burn the adaptation phases first (or be silently ignored
    # when auto happens to fall back to MH).
    if (
        not isinstance(n_leapfrog, str)
        and (scheme == "windowed" or (scheme == "auto" and window is not None))
    ):
        w_eff = window if window is not None else min(
            2, (int(n_leapfrog) + 1) // 2
        )
        if w_eff < 1 or 2 * w_eff > int(n_leapfrog) + 1:
            raise ValueError(
                f"window={w_eff} needs 1 <= window and 2*window <= "
                f"n_leapfrog + 1 (n_leapfrog={n_leapfrog})"
            )
    if state is None:
        # cached wrapper: a fresh lambda per call would be a new static-arg
        # hash for _hmc_scan's jit, recompiling all three phases every call
        log_prob_fn = _stateless_wrapper(log_prob_fn)
        state = ()
    x0 = jnp.asarray(x0)
    if mesh is not None:
        from ..parallel.mesh import check_divisible, replicate, shard_batch

        check_divisible(mesh, x0.shape[0], "walkers")
        state = replicate(mesh, state)
        shard = lambda u: shard_batch(mesh, u)  # noqa: E731
    else:
        shard = lambda u: u  # noqa: E731
    auto_warmup = isinstance(warmup, str)
    if auto_warmup and warmup != "auto":
        raise ValueError(f"warmup must be an int or 'auto', got {warmup!r}")
    if not auto_warmup and int(warmup) < 1 and warm_start is None:
        # a 0-length warmup scan yields an empty sample stack whose metric
        # estimate is all-NaN and dies later in a cryptic Cholesky error;
        # the supported way to skip adaptation is warm_start=
        raise ValueError(
            f"warmup must be >= 1 (got {warmup}); to skip adaptation pass "
            "warm_start= from a previous HMCResult"
        )
    auto_l = isinstance(n_leapfrog, str)
    if auto_l:
        if n_leapfrog != "auto":
            raise ValueError(
                f"n_leapfrog must be an int or 'auto', got {n_leapfrog!r}"
            )
        # warmup at half the PROBE ceiling (not half the final production
        # length, which isn't known yet): the adapted eps must transfer to
        # probe lengths up to l_max
        l_warm = max(l_max // 2, 1)
    elif warmup_leapfrog is not None:
        l_warm = int(warmup_leapfrog)
        if l_warm < 1:
            # zero-length warmup trajectories would freeze the walkers and
            # collapse the phase-A metric estimate (cov ~ 0) with no error
            raise ValueError(
                f"warmup_leapfrog must be >= 1, got {warmup_leapfrog}"
            )
    else:
        # Warmup needs acceptance statistics and roughly-stationary
        # samples, not decorrelated ones, so it runs at HALF the
        # production length (measured on the flagship: l_warm=4 matches
        # l_warm=8's adaptation exactly -- eps transfer intact, tau
        # 1.89-1.90 either way -- at ~3.5% better end-to-end ESS/s, while
        # l_warm=2 over-adapts eps (0.43 vs 0.35) and costs ~8% tau)
        l_warm = max(int(n_leapfrog) // 2, 1)
    dtype = x0.dtype
    nwalkers, ndim = x0.shape
    if warmup_walkers is None:
        n_warm_walk = nwalkers
    else:
        n_warm_walk = int(warmup_walkers)
        if not 1 <= n_warm_walk <= nwalkers:
            raise ValueError(
                f"warmup_walkers must be in [1, nwalkers={nwalkers}], "
                f"got {warmup_walkers}"
            )
        if mesh is not None:
            from ..parallel.mesh import check_divisible

            check_divisible(mesh, n_warm_walk, "warmup_walkers")
    bounded = lo is not None
    lo_np = np.asarray(lo, np.float64) if bounded else None
    width_np = (
        np.asarray(hi, np.float64) - lo_np if bounded else None
    )

    def tf_of(mu, chol):
        d = {"mu": jnp.asarray(mu, dtype), "chol": jnp.asarray(chol, dtype)}
        if bounded:
            d["lo"] = jnp.asarray(lo_np, dtype)
            d["width"] = jnp.asarray(width_np, dtype)
        else:
            d["lo"] = d["width"] = jnp.zeros((), dtype)  # placeholders
        return d

    k_a, k_b, k_run = jax.random.split(key, 3)
    log_eps0 = jnp.asarray(np.log(eps0), dtype)

    if warm_start is not None:
        # ---- reuse a previous run's adaptation: skip every warmup phase
        mu_z = np.asarray(warm_start.precond_mu, np.float64)
        chol_z = np.asarray(warm_start.precond_chol, np.float64)
        if mu_z.shape != (ndim,) or chol_z.shape != (ndim, ndim):
            raise ValueError(
                f"warm_start metric is for ndim={mu_z.shape[0]}, "
                f"x0 has ndim={ndim}"
            )
        tf = tf_of(mu_z, chol_z)
        uf = shard(jnp.asarray(
            _x_to_u(x0, lo_np, width_np, mu_z, chol_z).astype(dtype)
        ))
        log_eps = jnp.asarray(np.log(warm_start.step_size), dtype)
        n_warm_total = 0
        # no adaptation runs: the previous run's production acceptance is
        # the best available proxy for the scheme="auto" branch choice
        adapted_acc = float(np.mean(np.asarray(warm_start.acceptance)))
        if auto_l:
            n_leapfrog = int(warm_start.n_leapfrog)
    else:
        # ---- phase A: identity metric, adapt eps, estimate the metric
        # (phases run on the first n_warm_walk walkers -- see
        # ``warmup_walkers``; the subset is tiled back up for production)
        mu0 = np.zeros(ndim)
        chol0 = np.eye(ndim)
        tf = tf_of(mu0, chol0)
        x0w = x0[:n_warm_walk]
        u0 = shard(jnp.asarray(_x_to_u(x0w, lo_np, width_np, mu0, chol0).astype(dtype)))
        if auto_warmup:
            xs_np, _, log_eps, n_done, _ = _adaptive_phase(
                log_prob_fn, state, tf, u0, k_a, log_eps0,
                n_leapfrog=l_warm, bounded=bounded,
                target_accept=target_accept, traj_jitter=traj_jitter,
            )
        else:
            xs, _, _, _, log_eps = _hmc_scan(
                log_prob_fn, state, tf, u0, k_a, log_eps0,
                nsteps=warmup, n_leapfrog=l_warm, adapt=True,
                bounded=bounded, target_accept=target_accept,
                traj_jitter=traj_jitter,
            )
            xs_np, n_done = np.asarray(xs), warmup
        # host-side metric estimation (all conversions in numpy: eager device
        # ops pay a multi-second remote compile on some runtimes)
        half = xs_np[n_done // 2:].reshape(-1, ndim).astype(np.float64)
        z = _x_to_u(half, lo_np, width_np, mu0, chol0)
        mu_z = z.mean(0)
        cov_z = np.atleast_2d(np.cov(z.T)) + 1e-10 * np.eye(ndim)
        chol_z = np.linalg.cholesky(cov_z)

        # ---- phase B: new metric, re-adapt eps from the phase-A end state
        tf = tf_of(mu_z, chol_z)
        xf = xs_np[-1].astype(np.float64)
        u0 = shard(jnp.asarray(_x_to_u(xf, lo_np, width_np, mu_z, chol_z).astype(dtype)))
        if auto_warmup:
            _, uf, log_eps, n_done_b, adapted_acc = _adaptive_phase(
                log_prob_fn, state, tf, u0, k_b, log_eps,
                n_leapfrog=l_warm, bounded=bounded,
                target_accept=target_accept, traj_jitter=traj_jitter,
            )
        else:
            _, _, accs_b, uf, log_eps = _hmc_scan(
                log_prob_fn, state, tf, u0, k_b, log_eps,
                nsteps=warmup, n_leapfrog=l_warm, adapt=True,
                bounded=bounded, target_accept=target_accept,
                traj_jitter=traj_jitter,
            )
            n_done_b = warmup
            # settled acceptance under the final metric: mean over the
            # last quarter of phase B (early steps are still adapting)
            accs_np = np.asarray(accs_b)
            adapted_acc = float(np.mean(accs_np[-max(len(accs_np) // 4, 1):]))
        n_warm_total = n_done + n_done_b

        # ---- optional probe: calibrate the production trajectory length
        if auto_l:
            # fold_in rather than a wider initial split keeps the fixed-L
            # key stream untouched by the probe's existence.  The index must
            # dodge phase B's own stream: on threefry,
            # fold_in(k, i) == split(k, n)[i] for i < n, and phase B consumed
            # split(k_b, warmup) -- so a small index would replay warmup key
            # material inside the probe.  A large constant is out of reach of
            # any realistic split width.
            k_c = jax.random.fold_in(k_b, 0x50524F42)
            us, _, uf, _ = _hmc_scan(
                log_prob_fn, state, tf, uf, k_c, log_eps,
                nsteps=probe_steps, n_leapfrog=l_max, adapt=False,
                bounded=bounded, target_accept=target_accept, probe=True,
            )
            n_leapfrog = _select_leapfrog(np.asarray(us), l_max)

        if n_warm_walk < nwalkers:
            # tile the warmed subset up to the production batch; exact
            # duplicates split apart on the first production step (each
            # walker owns its RNG lane) and decorrelate within ~tau steps
            uf = shard(uf[jnp.arange(nwalkers) % n_warm_walk])

    # ---- resolve scheme="auto" now that the adapted acceptance is known:
    # windowed + persistent momentum is the measured-best kernel, but only
    # when acceptance is high enough for persistence to pay (rejections
    # reverse the persistent momentum); otherwise classic endpoint MH
    persist_eff = float(persist)
    if scheme == "auto":
        if adapted_acc >= _AUTO_ACC_MIN:
            scheme = "windowed"
            if persist_eff == 0.0:
                persist_eff = _AUTO_PERSIST
        else:
            scheme, persist_eff = "mh", 0.0
        logger.info(
            "HMC scheme='auto': adapted acceptance %.3f -> %s"
            " (persist %.2f)", adapted_acc, scheme, persist_eff,
        )

    # ---- production: fixed eps
    if scheme in ("multinomial", "windowed"):
        if scheme == "multinomial":
            w_eff = 0
        else:
            # n_leapfrog may have been resolved by the "auto" probe above,
            # so (re-)derive and validate against the final length
            w_eff = window if window is not None else min(
                2, (int(n_leapfrog) + 1) // 2
            )
            if w_eff < 1 or 2 * w_eff > int(n_leapfrog) + 1:
                raise ValueError(
                    f"window={w_eff} needs 1 <= window and 2*window <= "
                    f"n_leapfrog + 1 (n_leapfrog={n_leapfrog})"
                )
        xs, lps, accs, _ = _hmc_scan_trajectory(
            log_prob_fn, state, tf, uf, k_run, log_eps,
            nsteps=nsteps, n_leapfrog=n_leapfrog, bounded=bounded,
            window=w_eff, persist=persist_eff,
        )
    else:
        xs, lps, accs, _, _ = _hmc_scan(
            log_prob_fn, state, tf, uf, k_run, log_eps,
            nsteps=nsteps, n_leapfrog=n_leapfrog, adapt=False,
            bounded=bounded, target_accept=target_accept,
            traj_jitter=traj_jitter,
        )
    return HMCResult(
        chain=jnp.transpose(xs, (1, 0, 2)),
        log_prob=lps.T,
        acceptance=accs,
        final_state=xs[-1],
        step_size=float(np.exp(np.asarray(log_eps))),
        precond_chol=chol_z,
        precond_mu=mu_z,
        n_leapfrog=int(n_leapfrog),
        warmup_steps=int(n_warm_total),
        scheme=scheme,
        persist=persist_eff if scheme == "windowed" else 0.0,
    )
