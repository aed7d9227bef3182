"""Flow-preconditioned sequential Monte Carlo (pocoMC-parity sampler).

From-scratch rebuild of the capability the reference gets from pocoMC 1.2.6
(src/mcmc.py:752-819): Preconditioned Monte Carlo -- an adaptive-temperature
SMC sampler whose MCMC moves run in the latent space of a normalizing flow
fit to the current particles.

Semantics follow pocoMC's persistent-sampling design (the reference's
docstring at src/mcmc.py:755-780 documents the knobs):

1.  Draw ``n_prior`` particles from the prior; work in unbounded coordinates
    ``u = logit((x - lo) / (hi - lo))`` so every particle maps to a valid
    parameter point (this is why pocoMC needs the ``finite=True`` likelihood
    contract -- flows cannot digest -inf; src/mcmc.py:196-198).
2.  Keep EVERY particle ever produced (persistent sampling).  A particle
    born at inverse temperature ``beta_t`` is approximately distributed as
    ``p_t = L^{beta_t} pi / Z_t``; its importance weight toward the target
    ``L^beta pi`` uses the balance heuristic over the mixture of all past
    iteration distributions:

        log w_j(beta) = beta * logl_j
                        - logsumexp_t[ log(n_t/N) + beta_t*logl_j - logZ_t ]

    (the prior density cancels between target and every mixture component).
3.  Anneal ``beta`` 0 -> 1: pick the next beta by bisection so the weight
    ESS over the FULL history equals ``n_effective`` (an absolute count --
    history growth is what makes ``n_effective > n_active`` attainable,
    matching the reference's flagship ``n_effective=8000, n_active=4000``).
    If the current history cannot support the target ESS, beta holds and the
    iteration only accumulates particles (pocoMC behavior).
4.  Each iteration resamples ``n_active`` ACTIVE particles from the weighted
    history, fits the normalizing-flow preconditioner to them, and advances
    them with t-preconditioned Crank-Nicolson MCMC.  The per-iteration step
    count is ADAPTIVE: a ``lax.while_loop`` runs until the mean latent-space
    correlation with the start positions falls below 0.75, capped at
    ``n_max_steps`` (pocoMC adapts the same way with the same cap knob).
    ``sample="tpcn"`` max-likelihood-fits the latent Student-t dof each
    iteration (on device); ``"pcn"`` pins nu = inf; ``"rwm"`` is a plain
    latent-space random-walk Metropolis kernel.
5.  After beta = 1, iterations continue at beta = 1 until the history ESS
    reaches ``n_total`` ("the total number of effectively independent
    samples to be collected", reference docstring src/mcmc.py:768).
6.  Evidence: the persistent-sampling estimate
    ``Z_beta = (1/N) sum_j w_j(beta)`` with a batch-bootstrap standard
    error (:func:`_ps_logz_err`), plus, when ``n_evidence > 0``, an
    importance-sampling refinement (pocoMC's default uses its flow; here
    the proposal is ANALYTIC by design -- the sampler's flow, refit on a
    duplicate-laden posterior resample, measurably memorizes its fit
    points (+6.4 nats of reported density at fit particles vs held-out
    particles on the 17-dim flagship), which biased every flow-based
    estimator low; see :func:`_fit_t_proposal`).  The proposal is
    DEFENSIVE: a mixture of a moment-matched multivariate-Student-t
    (``evidence_base_dof``) fit to the weighted history and an
    ``evidence_defensive_frac`` component of the prior restricted to the
    box (Hesterberg's defensive mixture: it bounds every weight by
    ``L_max / frac``, so the right tail of the weight distribution cannot
    run away).  The weights are then Pareto-smoothed (PSIS, Vehtari et
    al.) and the GPD tail index ``khat`` is reported: ``khat > 0.7``
    inflates the IS error 3x in the selection (the delta-method error
    under-reports on heavy tails).  An **optimal-bridge diagnostic**
    (:func:`_bridge_logz`, Meng & Wong) over the same draws plus a
    posterior resample of the history is reported alongside
    (``logz_bridge``) -- asymptotically undercoverage-proof, but kept
    out of the primary selection after a measured finite-sample bias at
    flagship sample sizes (see :func:`_select_evidence`).  The primary
    ``logz``/``logz_err`` pair is the tightest of PS and
    (khat-calibrated) IS surviving a 3-sigma mutual cross-check, else PS
    with the error inflated to half the disagreement.  ``logz_source``
    names the chosen estimator;
    ``logz_ps``/``logz_is``/``logz_bridge`` (+errors) and ``logz_khat``
    always report the full picture.  A repeat-seed calibration test pins
    the reported error against actual scatter (test_smc.py).

Returns the reference's chain contract: ``samples (n, d), weights, logl,
logp, logz, logz_err`` (src/mcmc.py:816-819) -- with REAL importance
weights: downstream moments must use ``np.average(..., weights=weights)``.

Host/device split: the MCMC phase is ONE device program per iteration (the
adaptive loop lives inside ``lax.while_loop``; the latent dof fit is also
on-device), so the only per-iteration host sync is pulling the n_active
moved particles -- required anyway for the data-dependent beta bisection,
which runs on the (small) host-side history arrays.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .flows import (
    FlowConfig,
    fit_flow_dynamic,
    flow_forward,
    flow_inverse,
    init_flow,
)

logger = logging.getLogger(__name__)

# stop the adaptive MCMC phase once the mean latent-space correlation with
# the phase-start positions decays below this (pocoMC's mixing criterion)
_CORR_STOP = 0.75


# ---------------------------------------------------------------- transforms


def _to_unbounded(x, lo, hi):
    p = jnp.clip((x - lo) / (hi - lo), 1e-7, 1 - 1e-7)
    return jnp.log(p) - jnp.log1p(-p)


def _to_bounded(u, lo, hi):
    """u -> x plus log |dx/du| (per sample)."""
    sig = jax.nn.sigmoid(u)
    x = lo + (hi - lo) * sig
    logdet = jnp.sum(
        jnp.log(hi - lo) + jax.nn.log_sigmoid(u) + jax.nn.log_sigmoid(-u),
        axis=-1,
    )
    return x, logdet


# Host (numpy) twins for the DRIVER loop: eager device calls of the above
# pay a remote XLA compile per shape on some runtimes, and the final
# history-collection shape differs every run.  (samplers/hmc.py reuses
# _to_unbounded_np for its walker starts -- keep the two transforms in
# sync with the jax forms above.)
def _to_unbounded_np(x, lo, hi):
    p = np.clip((x - lo) / (hi - lo), 1e-7, 1 - 1e-7)
    return np.log(p) - np.log1p(-p)


def _log_sigmoid_np(u):
    return -np.logaddexp(0.0, -u)


def _to_bounded_np(u, lo, hi):
    from scipy.special import expit  # overflow-stable sigmoid

    x = lo + (hi - lo) * expit(u)
    logdet = np.sum(
        np.log(hi - lo) + _log_sigmoid_np(u) + _log_sigmoid_np(-u), axis=-1
    )
    return x, logdet


# -------------------------------------------------------------- core kernels


@partial(jax.jit, static_argnums=(0, 1))
def _eval_u(log_likelihood, log_prior_fn, state, u, lo, hi, log_prior_x):
    """u-space particle evaluation: returns (x, logl, logp_u, logp_x).

    ``logp_u`` is the prior density in u-coordinates:
    ``log p_x(x) + log|dx/du|``.  With no custom prior, log p_x is the
    uniform-box constant; otherwise ``log_prior_fn(x)`` (traceable) is used,
    floored at a large finite value so flow/pCN arithmetic never sees -inf.
    """
    x, logdet_xu = _to_bounded(u, lo, hi)
    logl = log_likelihood(state, x, True)
    if log_prior_fn is None:
        logp_x = jnp.full(u.shape[:1], log_prior_x, dtype=u.dtype)
    else:
        logp_x = jnp.maximum(log_prior_fn(x), -1e30)
    logp_u = logp_x + logdet_xu
    return x, logl, logp_u, logp_x


def _t_logpdf(z2: jnp.ndarray, nu: jnp.ndarray, d: int) -> jnp.ndarray:
    """log density (up to const) of a standard multivariate-t with dof nu,
    as a function of |z|^2."""
    return -0.5 * (nu + d) * jnp.log1p(z2 / nu)


_DOF_GRID = (3.0, 5.0, 8.0, 12.0, 20.0, 50.0, 1e6)


@jax.jit
def _estimate_dof(z: jnp.ndarray) -> jnp.ndarray:
    """Max-likelihood dof of a standard multivariate-t over a small grid.

    pocoMC fits the latent distribution's degrees of freedom each iteration;
    a coarse grid picks between heavy tails and Gaussian (nu = 1e6 ~
    Gaussian pCN).  Runs on device: no host round-trip of the latent batch.

    The nu-only normalization ``gammaln((nu+d)/2) - gammaln(nu/2)
    - d/2 log(nu)`` is precomputed on the HOST in float64 at trace time
    (the grid is static): in f32 it is a difference of ~1e6-magnitude
    values whose rounding noise (~1) is as large as the O(1) likelihood
    gaps between grid points, which made the argmax flip at random.
    """
    from scipy.special import gammaln as gammaln_np

    z2 = jnp.sum(z**2, axis=1)
    d = z.shape[1]
    grid_np = np.asarray(_DOF_GRID, dtype=np.float64)
    const_np = (
        gammaln_np((grid_np + d) / 2)
        - gammaln_np(grid_np / 2)
        - 0.5 * d * np.log(grid_np)
    )
    grid = jnp.asarray(_DOF_GRID, dtype=z.dtype)
    const = jnp.asarray(const_np, dtype=z.dtype)

    def ll(nu, c):
        return c - 0.5 * (nu + d) * jnp.mean(jnp.log1p(z2 / nu))

    lls = jax.vmap(ll)(grid, const)
    return grid[jnp.argmax(lls)]


@partial(jax.jit, static_argnums=(0, 1), static_argnames=("kernel", "config"))
def _mcmc_adaptive(
    log_likelihood,
    log_prior_fn,
    state,
    flow_params,
    u,
    logl,
    logp_u,
    beta,
    rho,
    nu,
    key,
    lo,
    hi,
    log_prior_x,
    n_max_steps,
    *,
    kernel: str,
    config: FlowConfig,
):
    """Adaptive-length MCMC phase in flow-latent space (one device program).

    Target in z-space: pi(z) = beta*logl + logp_u + log|du/dz|.  Kernels:

    - ``tpcn``/``pcn``: t-preconditioned Crank-Nicolson.  The proposal uses
      the Gaussian scale-mixture form of the multivariate-t reference
      measure with ``nu`` degrees of freedom: draw the per-particle scale
      from its conditional ``s | z ~ InvGamma((nu+d)/2, (nu+|z|^2)/2)``,
      then ``z' = sqrt(1-rho^2) z + rho sqrt(s) xi`` -- this preserves
      t_nu(0, I) exactly, so the MH ratio uses
      ``L(z) = log pi(z) - log t_nu(z)`` (pocoMC's ``sample="tpcn"``;
      nu -> inf recovers Gaussian pCN, ``"pcn"``).
    - ``rwm``: symmetric random walk ``z' = z + rho xi`` targeting pi(z)
      directly (pocoMC's alternative kernel, src/mcmc.py:760-762).

    The step count is data-dependent (``lax.while_loop``): steps continue
    until the mean per-dimension Pearson correlation between the current and
    phase-start latent positions drops below 0.75, capped at
    ``n_max_steps``.  Step size adapts toward 0.234 acceptance each step.
    Returns (u, logl, logp_u, logp_x, rho, steps_taken, mean_accept).
    """
    n, d = u.shape
    z0, logdet_zu = flow_forward(flow_params, u, config)
    logdet_uz0 = -logdet_zu  # log|du/dz| = -log|dz/du|
    z0_mean = jnp.mean(z0, axis=0)
    z0_sd = jnp.std(z0, axis=0) + 1e-12

    def lfun(logl_v, logp_u_v, logdet_uz_v, z):
        base = beta * logl_v + logp_u_v + logdet_uz_v
        if kernel == "rwm":
            return base
        z2 = jnp.sum(z**2, axis=-1)
        return base - _t_logpdf(z2, nu, d)

    def corr_with_start(z):
        zm = jnp.mean(z, axis=0)
        zs = jnp.std(z, axis=0) + 1e-12
        c = jnp.mean((z0 - z0_mean) * (z - zm), axis=0) / (z0_sd * zs)
        return jnp.mean(jnp.abs(c))

    def body(carry):
        z, logl_c, logp_c, logdet_c, rho, key, i, _corr, acc_sum = carry
        key, k1, k2, k3 = jax.random.split(key, 4)
        xi = jax.random.normal(k1, z.shape, z.dtype)
        if kernel == "rwm":
            zp = z + rho * xi
        else:
            # s | z ~ InvGamma((nu+d)/2, (nu+|z|^2)/2)
            z2 = jnp.sum(z**2, axis=-1)
            g = jax.random.gamma(k3, 0.5 * (nu + d), (n,), z.dtype)
            s = 0.5 * (nu + z2) / g
            zp = jnp.sqrt(1.0 - rho**2) * z + rho * jnp.sqrt(s)[:, None] * xi
        up, logdet_uzp = flow_inverse(flow_params, zp, config)
        _, logl_p, logp_p, _ = _eval_u(
            log_likelihood, log_prior_fn, state, up, lo, hi, log_prior_x
        )
        log_a = lfun(logl_p, logp_p, logdet_uzp, zp) - lfun(
            logl_c, logp_c, logdet_c, z
        )
        accept = jnp.log(jax.random.uniform(k2, (n,), z.dtype)) < log_a
        z = jnp.where(accept[:, None], zp, z)
        logl_c = jnp.where(accept, logl_p, logl_c)
        logp_c = jnp.where(accept, logp_p, logp_c)
        logdet_c = jnp.where(accept, logdet_uzp, logdet_c)
        rate = jnp.mean(accept.astype(z.dtype))
        # Robbins-Monro toward 0.234 in log space
        rho = jnp.clip(rho * jnp.exp(0.5 * (rate - 0.234)), 1e-4, 0.99)
        return (
            z, logl_c, logp_c, logdet_c, rho, key,
            i + 1, corr_with_start(z), acc_sum + rate,
        )

    def cond(carry):
        i, corr = carry[6], carry[7]
        return (i < n_max_steps) & ((corr > _CORR_STOP) | (i < 2))

    one = jnp.asarray(1.0, u.dtype)
    init = (z0, logl, logp_u, logdet_uz0, rho, key,
            jnp.asarray(0, jnp.int32), one, jnp.asarray(0.0, u.dtype))
    z, logl, logp_u, logdet_uz, rho, _, steps, _, acc_sum = lax.while_loop(
        cond, body, init
    )
    u, _ = flow_inverse(flow_params, z, config)
    _, logdet_xu = _to_bounded(u, lo, hi)
    logp_x = logp_u - logdet_xu
    steps_f = jnp.maximum(steps.astype(u.dtype), 1.0)
    return u, logl, logp_u, logp_x, rho, steps, acc_sum / steps_f


@partial(
    jax.jit,
    static_argnums=(0, 1),
    static_argnames=("kernel", "config", "patience"),
)
def _smc_iteration(
    log_likelihood,
    log_prior_fn,
    state,
    flow_params,
    flow_weights,
    u_act,
    logl_act,
    logp_u_act,
    beta,
    rho,
    key,
    lo,
    hi,
    log_prior_x,
    n_max_steps,
    steps_fit,
    *,
    kernel: str,
    config: FlowConfig,
    patience: int,
):
    """One fused SMC iteration: flow fit -> dof estimate -> adaptive MCMC.

    The whole per-iteration device phase is ONE program so the annealing
    loop pays one dispatch per iteration and one compile per run.  Profiled
    on the flagship bench config (TPU v5e via the axon tunnel), the
    unfused pipeline spent 41% of SMC wall time in fit_flow (three step-
    budget/batch-shape compiles), 11% in the separate flow_forward dispatch
    feeding the dof fit, and 11% in _mcmc_adaptive -- mostly per-call
    latency, not compute.  ``steps_fit`` is TRACED (fit_flow_dynamic), so
    the cold first fit and the shorter warm refits share this one program.

    Returns ``(flow_params, u, logl, logp_x, rho, stats)`` with ``stats``
    = ``[steps_taken, mean_accept, flow_loss, rho]`` stacked as one small
    device vector (a single host pull covers every per-iteration log
    figure).
    """
    k_fit, k_mcmc = jax.random.split(key)
    del k_fit  # the flow fit is deterministic; split kept for key hygiene
    flow_params, flow_loss = fit_flow_dynamic(
        flow_params, u_act, flow_weights, steps_fit,
        config=config, patience=patience,
    )
    if kernel == "tpcn":
        z_act, _ = flow_forward(flow_params, u_act, config)
        nu = _estimate_dof(z_act)
    else:
        nu = jnp.asarray(1e6, u_act.dtype)
    u, logl, _, logp_x, rho, steps, acc = _mcmc_adaptive(
        log_likelihood, log_prior_fn, state, flow_params, u_act, logl_act,
        logp_u_act, beta, rho, nu, k_mcmc, lo, hi, log_prior_x, n_max_steps,
        kernel=("rwm" if kernel == "rwm" else "tpcn"), config=config,
    )
    stats = jnp.stack([
        steps.astype(u.dtype), acc, flow_loss.astype(u.dtype), rho,
    ])
    return flow_params, u, logl, logp_x, rho, stats


# --------------------------------------------- persistent-sampling weights


def _mixture_terms(logl_h, betas, logzs, counts):
    """Beta-INDEPENDENT pieces of the balance-heuristic weights.

    ``logl_h (N,)``: history log-likelihoods; ``betas/logzs/counts (T,)``:
    per-iteration inverse temperature, evidence estimate, particle count.
    Returns ``(logl_clean (N,), log_mix (N,))`` with
    ``log w_j(beta) = beta * logl_clean_j - log_mix_j`` -- the prior density
    cancels between the target and every mixture component (see module
    docstring).  Computed ONCE per SMC iteration; the beta bisection then
    reuses it across its ~60 ESS evaluations (the (N, T) matrix does not
    depend on the query beta).
    """
    # nan=-1e300 too: a NaN likelihood particle must get ~zero weight, not
    # logl=0 (which would dominate every real, strongly negative particle)
    logl_h = np.nan_to_num(
        np.asarray(logl_h, dtype=np.float64), nan=-1e300, neginf=-1e300
    )
    betas = np.asarray(betas, dtype=np.float64)
    logzs = np.asarray(logzs, dtype=np.float64)
    counts = np.asarray(counts, dtype=np.float64)
    n_total = counts.sum()
    # (N, T): log[(n_t/N) * exp(beta_t * logl_j - logZ_t)]
    comp = (
        logl_h[:, None] * betas[None, :]
        - logzs[None, :]
        + np.log(counts / n_total)[None, :]
    )
    m = comp.max(axis=1)
    log_mix = m + np.log(np.sum(np.exp(comp - m[:, None]), axis=1))
    return logl_h, log_mix


def _log_weights(logl_clean, log_mix, beta):
    """Balance-heuristic log-weights at ``beta`` from the precomputed
    :func:`_mixture_terms` pieces (the (N, T) mixture matrix is
    beta-independent and reused across the bisection's ESS evaluations)."""
    return beta * logl_clean - log_mix


def _ess(log_w):
    log_w = log_w - np.max(log_w)
    w = np.exp(log_w)
    return (w.sum() ** 2) / np.sum(w**2)


def _next_beta(logl_clean, log_mix, beta, n_effective):
    """Largest beta' in [beta, 1] whose history-weight ESS >= n_effective.

    Takes the precomputed :func:`_mixture_terms`.  Returns ``beta``
    unchanged when even the current temperature cannot support the target
    ESS -- the iteration then only accumulates particles
    (persistent-sampling behavior)."""
    def ess_at(b):
        return _ess(b * logl_clean - log_mix)

    if ess_at(beta) < n_effective:
        return beta
    if ess_at(1.0) >= n_effective:
        return 1.0
    lo_b, hi_b = beta, 1.0
    for _ in range(60):
        mid = 0.5 * (lo_b + hi_b)
        if ess_at(mid) >= n_effective:
            lo_b = mid
        else:
            hi_b = mid
    return lo_b


def _ps_logz_err(lw1, counts, rng, n_boot: int = 256) -> float:
    """Batch-bootstrap standard error of the persistent-sampling logZ.

    ``logZ_PS = log((1/N) sum_j w_j)`` over the full history.  History
    particles are correlated WITHIN an iteration batch (each batch is one
    MCMC phase over jointly resampled particles) and approximately
    independent ACROSS batches, so the bootstrap resamples whole iteration
    batches: draw T batch indices with replacement, form
    ``Z* = sum_t S_t* / sum_t n_t*`` from the per-batch weight sums, and
    report ``std(log Z*)``.  This replaces the earlier ad-hoc
    ``sqrt(sum w^2 - 1/n)`` (which was an ESS diagnostic, not a variance of
    logZ).  Conditioned on the realized annealing path; the repeat-seed
    calibration test (test_smc.py) bounds the total scatter against this
    error.
    """
    lw1 = np.asarray(lw1, dtype=np.float64)
    w = np.exp(lw1 - lw1.max())
    bounds = np.cumsum([0] + list(counts))
    s_t = np.array([w[a:b].sum() for a, b in zip(bounds[:-1], bounds[1:])])
    n_t = np.asarray(counts, dtype=np.float64)
    n_batches = len(n_t)
    idx = rng.integers(0, n_batches, size=(n_boot, n_batches))
    z_boot = s_t[idx].sum(axis=1) / n_t[idx].sum(axis=1)
    z_boot = np.maximum(z_boot, 1e-300)
    return float(np.std(np.log(z_boot)))


# PSIS reliability ceiling: a fitted GPD tail index above this means the
# importance-weight distribution has too heavy a right tail for the
# estimate (and its delta-method error) to be trusted (Vehtari et al.,
# "Pareto Smoothed Importance Sampling", JMLR 2024 -- k < 0.7 is the
# published finite-variance-in-practice threshold)
EVIDENCE_KHAT_MAX = 0.7


def _gpd_fit(x: np.ndarray) -> tuple[float, float]:
    """Fit a generalized Pareto (k, sigma) to exceedances ``x`` (ascending).

    Zhang & Stephens (2009) profile-posterior estimator (the method the
    PSIS paper prescribes): parametrize by ``b = k / sigma``, place the
    quantile-derived grid prior on ``b``, weight grid points by profile
    likelihood, and read ``k`` from the posterior-mean ``b``.  A weak
    Gaussian prior ``k ~ N(0.5, 1/sqrt(2 n))`` regularizes small tails.
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    prior_bs, prior_k = 3.0, 10.0
    m_est = 30 + int(np.sqrt(n))
    b = 1.0 - np.sqrt(m_est / (np.arange(1, m_est + 1, dtype=np.float64) - 0.5))
    b /= prior_bs * x[max(int(n / 4 + 0.5) - 1, 0)]
    b += 1.0 / x[-1]
    k = np.mean(np.log1p(-b[:, None] * x), axis=1)
    log_lik = n * (np.log(-b / k) - k - 1.0)
    w = 1.0 / np.sum(np.exp(log_lik - log_lik[:, None]), axis=1)
    keep = w >= 10 * np.finfo(float).eps
    b, w = b[keep], w[keep]
    b_post = np.sum(b * w / w.sum())
    k_post = float(np.mean(np.log1p(-b_post * x)))
    sigma = -k_post / b_post
    k_post = (n * k_post + prior_k * 0.5) / (n + prior_k)
    return float(k_post), float(sigma)


def _psis_smooth(log_w: np.ndarray) -> tuple[np.ndarray, float]:
    """Pareto-smoothed importance weights plus the tail index ``khat``.

    Fits a GPD to the ``M = min(n/5, 3 sqrt(n))`` largest weights
    (exceedances over the (n-M)-th order statistic) and replaces them with
    the expected order statistics of the fit, capped at the raw maximum
    (Vehtari et al. 2024, algorithm 1).  Smoothing tames the variance the
    heaviest realized weights inject; ``khat`` diagnoses whether the tail
    was represented at all (``khat > 0.7`` = unreliable).  Returns the
    input unchanged with ``khat = nan`` when the tail is too small to fit
    (< 5 points) or degenerate (all exceedances equal).
    """
    log_w = np.asarray(log_w, dtype=np.float64)
    n = log_w.shape[0]
    # the tail is sized from the FINITE weight count: with many exact-zero
    # (-inf) draws a count-based tail would reach into them, and the GPD
    # smoothing would fabricate positive mass for draws that contributed
    # none (clamped 1e-300 pseudo-exceedances), biasing logz_is upward
    n_fin = int(np.isfinite(log_w).sum())
    m_tail = min(n_fin // 5, int(3.0 * np.sqrt(n_fin)))
    if m_tail < 5:
        return log_w, float("nan")
    order = np.argsort(log_w)
    tail_idx = order[n - m_tail:]
    log_max = log_w[order[-1]]
    if not np.isfinite(log_max):
        return log_w, float("nan")
    # weight space, scaled so the max raw weight is 1 (overflow-safe)
    w_tail = np.exp(log_w[tail_idx] - log_max)
    cutoff = np.exp(log_w[order[n - m_tail - 1]] - log_max)
    exceed = w_tail - cutoff
    if exceed[-1] <= 0 or not np.all(np.isfinite(exceed)):
        return log_w, float("nan")
    k, sigma = _gpd_fit(np.maximum(exceed, 1e-300))
    if not np.isfinite(k) or sigma <= 0:
        return log_w, float("nan")
    # expected order statistics of the fitted GPD, capped at the raw max
    p = (np.arange(1, m_tail + 1) - 0.5) / m_tail
    if abs(k) < 1e-12:
        q = -sigma * np.log1p(-p)
    else:
        q = sigma / k * (np.power(1.0 - p, -k) - 1.0)
    smoothed = np.minimum(cutoff + q, 1.0)
    out = log_w.copy()
    out[tail_idx] = np.log(smoothed) + log_max
    return out, float(k)


def _fit_t_proposal(u_hist, log_w, dof: float) -> dict:
    """Moment-matched multivariate-Student-t evidence proposal (host f64).

    Fit on the WEIGHTED history (normalized ``log_w``): mean + covariance,
    with the t scale matrix set to ``cov * (dof - 2) / dof`` so the
    proposal's covariance exactly matches the posterior's while its tails
    stay heavier (``dof`` <= 2 keeps the raw covariance as the scale).

    An ANALYTIC proposal by design: evidence round 5 measured the refit
    FLOW memorizing its (duplicate-laden) fit resample -- log q read
    +6.4 nats higher at fit particles than at held-out posterior
    particles -- which biased every flow-based evidence estimator low
    (flagship: IS stuck at ~754.8 vs the true ~760.3 across rounds 3-5).
    A closed-form t cannot memorize points, its density is exact, and
    the bridge estimator only needs overlap, which moment matching
    guarantees.  Degenerate weighted covariances fall back to their
    diagonal (+ jitter).
    """
    log_w = np.asarray(log_w, np.float64)
    w = np.exp(log_w - log_w.max())
    w = w / w.sum()
    u_hist = np.asarray(u_hist, np.float64)
    mu = w @ u_hist
    du = u_hist - mu
    cov = (du * w[:, None]).T @ du
    d = u_hist.shape[1]
    cov = cov + 1e-10 * np.trace(cov) / d * np.eye(d) + 1e-12 * np.eye(d)
    scale = cov * ((dof - 2.0) / dof) if dof > 2.0 else cov
    try:
        chol = np.linalg.cholesky(scale)
    except np.linalg.LinAlgError:
        chol = np.sqrt(np.diag(np.maximum(np.diag(scale), 1e-12)))[
            :, None
        ] * np.eye(d)
    return {
        "mu": mu,
        "chol": chol,
        "dof": float(dof),
        "logdet": float(2.0 * np.sum(np.log(np.diag(chol)))),
    }


def _t_proposal_draw(rng, prop: dict, n: int) -> np.ndarray:
    """n iid draws from the fitted multivariate t (host numpy)."""
    d = prop["mu"].shape[0]
    xi = rng.standard_normal((n, d))
    w_chi2 = 2.0 * rng.standard_gamma(0.5 * prop["dof"], n)
    z = xi * np.sqrt(prop["dof"] / w_chi2)[:, None]
    return prop["mu"] + z @ prop["chol"].T


def _t_proposal_logpdf(prop: dict, u) -> np.ndarray:
    """Exact log density of the fitted multivariate t at ``u`` (host)."""
    from scipy.special import gammaln

    from scipy.linalg import solve_triangular

    u = np.asarray(u, np.float64)
    d = prop["mu"].shape[0]
    nu = prop["dof"]
    z = solve_triangular(prop["chol"], (u - prop["mu"]).T, lower=True)
    m2 = np.sum(z * z, axis=0)
    const = (
        gammaln(0.5 * (nu + d))
        - gammaln(0.5 * nu)
        - 0.5 * d * np.log(nu * np.pi)
        - 0.5 * prop["logdet"]
    )
    return const - 0.5 * (nu + d) * np.log1p(m2 / nu)


def _bridge_logz(lw_q, lw_p, logz0, n_iter: int = 200, tol: float = 1e-10):
    """Optimal-bridge (Meng & Wong 1996) log-evidence.

    ``lw_q``: ``log[L(x) pi(x) / q(x)]`` at iid PROPOSAL draws;
    ``lw_p``: the same quantity at (approximately unweighted) POSTERIOR
    draws; ``logz0``: initialization.  Iterates the self-consistent
    optimal bridge ``Z = E_q[l h] / E_p[h]`` with
    ``h = 1 / (s1 l + s2 Z)`` in log space.

    Robust exactly where raw importance sampling fails: both integrands
    are BOUNDED (``l h <= 1/s1`` on the q side, ``h <= 1/(s2 Z)`` on the
    p side), so a flow proposal that under-covers the posterior costs
    statistical efficiency, not correctness -- only support OVERLAP is
    required, which the posterior-weighted flow refit guarantees.
    Returns nan when the iteration fails to converge or either sample
    set is empty.
    """
    from scipy.special import logsumexp

    # +-inf values are REAL draws with exact 0 / bounded contributions
    # (l = 0 on the q side contributes nothing to the numerator; l = inf
    # on the p side means q underflowed there and h = 0): they stay in
    # the sample COUNTS and fall out of the sums naturally.  Dropping
    # them (an earlier revision filtered all non-finite) biases the
    # estimate -- removing h ~ 0 posterior terms inflates the
    # denominator mean and pushed the flagship bridge 15 log-units low.
    # Only NaN (arithmetic garbage) is removed.
    lw_q = np.asarray(lw_q, np.float64)
    lw_p = np.asarray(lw_p, np.float64)
    lw_q = lw_q[~np.isnan(lw_q)]
    lw_p = lw_p[~np.isnan(lw_p)]
    n2, n1 = lw_q.shape[0], lw_p.shape[0]
    if n1 == 0 or n2 == 0 or not np.isfinite(logz0):
        return float("nan")
    ls1 = np.log(n1 / (n1 + n2))
    ls2 = np.log(n2 / (n1 + n2))
    logz = float(logz0)
    with np.errstate(invalid="ignore"):
        for _ in range(n_iter):
            # inf - inf in the q-side term means l = inf there: the
            # integrand limit is 1/s1 -- substitute it exactly
            tq = lw_q - np.logaddexp(ls1 + lw_q, ls2 + logz)
            tq = np.where(np.isposinf(lw_q), -ls1, tq)
            num = logsumexp(tq) - np.log(n2)
            den = logsumexp(
                -np.logaddexp(ls1 + lw_p, ls2 + logz)
            ) - np.log(n1)
            new = num - den
            if not np.isfinite(new):
                return float("nan")
            if abs(new - logz) < tol:
                return float(new)
            logz = new
    return float("nan")


def _bridge_err(lw_q, lw_p, logz, rng, n_boot: int = 64) -> float:
    """Bootstrap standard error of the bridge estimate: resample both
    draw sets with replacement (duplicated posterior-resample entries
    appear in the array, so the bootstrap sees their variance cost) and
    re-run the iteration from the converged value."""
    lw_q = np.asarray(lw_q, np.float64)
    lw_p = np.asarray(lw_p, np.float64)
    lw_q = lw_q[~np.isnan(lw_q)]
    lw_p = lw_p[~np.isnan(lw_p)]
    boots = []
    for _ in range(n_boot):
        bq = lw_q[rng.integers(0, len(lw_q), len(lw_q))]
        bp = lw_p[rng.integers(0, len(lw_p), len(lw_p))]
        z = _bridge_logz(bq, bp, logz, n_iter=100)
        if np.isfinite(z):
            boots.append(z)
    if len(boots) < max(8, n_boot // 4):
        return float("nan")
    return float(np.std(boots))


@partial(jax.jit, static_argnums=(0, 1))
def _evidence_eval(
    log_likelihood, log_prior_fn, state, u_all, lo, hi, log_prior_x
):
    """One device program for the evidence draws: likelihood + u-space
    prior density at every proposal draw (the proposal density itself is
    ANALYTIC and evaluated on the host -- see :func:`_fit_t_proposal`)."""
    _, logl, logp_u, _ = _eval_u(
        log_likelihood, log_prior_fn, state, u_all, lo, hi, log_prior_x
    )
    return logl, logp_u


# PSIS error-inflation factor for khat > EVIDENCE_KHAT_MAX: the
# delta-method error under-reports when the weight tail is heavy
# (Vehtari et al.: errors unreliable past 0.7); measured flagship seed
# scatter (+potential residual bias) sits ~3x the claimed error there
EVIDENCE_KHAT_ERR_INFLATE = 3.0


def _select_evidence(logz_ps, err_ps, logz_is, err_is, khat=None):
    """Primary-evidence selection between the persistent-sampling and the
    (PSIS-smoothed, defensive-proposal) importance-sampling estimates.

    History of the design, all measured on the 17-dim flagship: the
    round-3/4 failure mode was an IS estimate biased LOW with a
    confidently small delta-method error (754.8 vs PS 760.3; root cause
    -- flow memorization of the fit resample -- fixed in round 5 by the
    analytic proposal).  The primary guard is therefore the **3-sigma
    cross-check against PS**: a refinement that disagrees beyond the
    combined errors is dropped and, since one of the two claimed errors
    is then provably too small, PS is returned with its error inflated
    to half the gap.  ``khat`` (the PSIS generalized-Pareto tail index)
    plays a calibration role rather than a hard gate: past
    :data:`EVIDENCE_KHAT_MAX` the delta-method error under-reports, so
    the IS error is inflated by :data:`EVIDENCE_KHAT_ERR_INFLATE` before
    the cross-check and in the primary pair when IS is selected (a hard
    khat gate was measured too trigger-happy: flagship khat realizations
    straddle 0.7-1.2 seed to seed while the PSIS estimate itself is
    stable at +-0.2; ``logz_err_is`` stays the raw delta-method error
    with ``logz_khat`` reported alongside).  The smallest-error
    surviving candidate wins.

    The bridge estimate is NOT a selection candidate: asymptotically its
    bounded integrands make it undercoverage-proof, but at flagship
    sample sizes it showed a reproducible finite-sample bias
    (758.4 +- 0.05 bootstrap across seeds vs the 760.3-761.3 cluster of
    PS/IS -- the q-weight tail mass it effectively truncates) with a
    bootstrap error blind to that bias.  It is reported as a diagnostic
    (``logz_bridge``) only.

    Returns ``(logz, logz_err, source, is_unreliable)`` with source in
    {"ps", "is"}; ``is_unreliable`` is True exactly when a refinement
    was attempted and none survived the cross-check (the caller's
    warning keys off it so the tolerance rule lives in one place).
    """
    cands = [(float(err_ps), 0, "ps", float(logz_ps))]
    attempted = False
    disagreement_gaps = []
    if logz_is is not None and err_is is not None:
        attempted = True
        err_eff = float(err_is)
        if khat is not None and np.isfinite(khat) and khat > EVIDENCE_KHAT_MAX:
            err_eff *= EVIDENCE_KHAT_ERR_INFLATE
        gap = abs(float(logz_is) - float(logz_ps))
        if gap <= 3.0 * float(np.hypot(err_eff, err_ps)):
            cands.append((err_eff, 1, "is", float(logz_is)))
        else:
            disagreement_gaps.append(gap)
    if len(cands) == 1 and attempted:
        err = float(err_ps)
        if disagreement_gaps:
            err = max(err, 0.5 * max(disagreement_gaps))
        return float(logz_ps), err, "ps", True
    err, _, source, val = min(cands)
    return val, err, source, False


def _draw_prior_in_box(custom_prior, rng, n, lo_np, hi_np):
    """Draw ``n`` prior samples strictly inside the box.

    Uniform-box prior (``custom_prior is None``): direct draws, mass
    fraction 1.  Custom prior: REJECTION-sample into the box instead of
    clipping -- clipped draws pile up exactly on the box faces, so the
    batch would no longer be prior-distributed and every downstream
    importance weight would be silently biased.  The accepted fraction
    estimates the prior mass inside the box (the truncation normalizer).
    Returns ``(draws (n, d), frac_in)``.
    """
    if custom_prior is None:
        return rng.uniform(lo_np, hi_np, (n, lo_np.shape[0])), 1.0
    kept, n_try, n_in = [], 0, 0
    while sum(a.shape[0] for a in kept) < n:
        if n_try >= 1000 * n:
            raise ValueError(
                "custom_prior places less than ~0.1% of its mass inside "
                "the sampling box [prior_lo, prior_hi]; check the "
                "parameter ranges against the prior"
            )
        try:
            # tie the draws to the run's seeded generator: scipy's rvs
            # without random_state uses the GLOBAL numpy state, which made
            # custom-prior runs non-reproducible run to run (and broke
            # checkpoint-resume bit-equality)
            draw = np.atleast_2d(np.asarray(
                custom_prior.rvs(n, random_state=rng)
            ))
        except TypeError:
            # duck-typed custom priors without the random_state kwarg:
            # draws come from their own stream; such runs are only
            # reproducible if that stream is seeded externally
            draw = np.atleast_2d(np.asarray(custom_prior.rvs(n)))
        m = np.all((draw > lo_np) & (draw < hi_np), axis=1)
        n_try += draw.shape[0]
        n_in += int(m.sum())
        kept.append(draw[m])
    x = np.concatenate(kept, axis=0)[:n]
    # margin only guards the logit transform against exact-boundary
    # round-off; the draws themselves are strictly inside
    x = np.clip(x, lo_np + 1e-9, hi_np - 1e-9)
    return x, n_in / n_try


def _systematic_resample(rng, log_w, n):
    """Systematic resample from LOG-weights (shared core lives in
    utils.closure.systematic_resample_indices)."""
    from ..utils.closure import systematic_resample_indices

    log_w = np.nan_to_num(
        np.asarray(log_w, dtype=np.float64), nan=-1e300, neginf=-1e300
    )
    return systematic_resample_indices(rng, np.exp(log_w - log_w.max()), n)


# --------------------------------------------------------- checkpoint/resume


def _key_to_host(key):
    """jax PRNG key -> picklable host tuple (handles typed + legacy keys)."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return ("typed", np.asarray(jax.random.key_data(key)))
    return ("raw", np.asarray(key))


def _key_from_host(t):
    kind, data = t
    if kind == "typed":
        return jax.random.wrap_key_data(jnp.asarray(data))
    return jnp.asarray(data)


def _save_smc_checkpoint(path, payload: dict) -> None:
    """Atomic pickle write (tmp + rename): a kill mid-write must leave
    either the previous checkpoint or the new one, never a torn file."""
    import os
    import pickle

    path = str(path)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def _load_smc_checkpoint(path, expect_knobs: dict):
    """Load + validate an SMC checkpoint; raises on a knob mismatch (a
    resumed run with different particle counts / kernel / seed would
    silently corrupt the persistent-sampling mixture weights)."""
    import pickle

    with open(path, "rb") as f:
        payload = pickle.load(f)
    got = payload.get("knobs", {})
    bad = {
        k: (got.get(k), v) for k, v in expect_knobs.items()
        if got.get(k) != v
    }
    if bad:
        raise ValueError(
            f"SMC checkpoint at {path} was written with different settings "
            f"(stored vs requested): {bad}; delete the checkpoint or rerun "
            "with the original knobs"
        )
    return payload


# -------------------------------------------------------------------- driver


def run_smc(
    log_likelihood: Callable,
    prior_lo: jnp.ndarray,
    prior_hi: jnp.ndarray,
    *,
    likelihood_state=None,
    n_effective: int = 1000,
    n_active: int = 250,
    n_prior: int = 2000,
    sample: str = "tpcn",
    n_max_steps: int = 200,
    n_total: int = 5000,
    n_evidence: int = 5000,
    seed: int = 42,
    custom_prior=None,
    flow_config: FlowConfig = FlowConfig(),
    flow_fit_steps: int = 300,
    flow_fit_steps_warm: int | None = None,
    flow_fit_patience: int = 25,
    max_iterations: int = 400,
    mesh=None,
    evidence_defensive_frac: float = 0.1,
    evidence_base_dof: float = 5.0,
    checkpoint_path=None,
    resume: bool = False,
) -> dict:
    """Run the preconditioned SMC sampler; see module docstring.

    ``mesh``: optional 1-D device mesh; the particle axis of every device
    phase (initial prior evaluation, per-iteration flow fit + MCMC, the
    evidence draws) is sharded over it and the likelihood state replicated
    (see :mod:`..parallel.mesh`).  Requires ``n_prior``/``n_active``
    divisible by the mesh size.

    ``log_likelihood(state, x, finite)`` maps (m, d) -> (m,) and must return
    finite values (-1e300) outside the box.

    ``custom_prior``: a uniform box prior is the native fast path.  A custom
    prior must expose a JAX-traceable ``log_prior_jax(x) -> (m,)`` (plus
    ``rvs(n)`` for initial draws); it is then used in the MCMC target and
    the evidence weights.  Objects with only a numpy ``logpdf`` (e.g.
    pocomc.Prior) cannot be traced into the device programs -- they are
    rejected rather than silently sampling under the wrong prior.

    ``evidence_defensive_frac``/``evidence_base_dof``: the defensive IS
    evidence proposal (module docstring item 6) -- the fraction of the
    ``n_evidence`` draws taken from the box-restricted prior, and the dof
    of the moment-matched multivariate-t component (lower = heavier
    proposal tails).

    ``checkpoint_path``: when set, the FULL driver state (persistent
    history, beta ladder, per-iteration normalizers, rng/key streams, flow
    parameters, rho) is atomically pickled there after every completed
    iteration; ``resume=True`` restores it and continues the run exactly
    where it stopped -- the resumed evolution is bit-for-bit the one an
    uninterrupted run would have produced.  A checkpoint written with
    different knobs is rejected loudly.

    Returns weighted posterior samples (ALL persistent-sampling particles;
    use ``weights`` for any expectation) once the beta=1 history ESS reaches
    ``n_total``.
    """
    if sample not in ("pcn", "tpcn", "rwm"):
        raise ValueError(f"unknown sample kernel: {sample}")
    if n_active > n_effective:
        raise ValueError(
            f"n_active ({n_active}) must not exceed n_effective "
            f"({n_effective}) (reference contract, src/mcmc.py:757-758)"
        )

    state = likelihood_state if likelihood_state is not None else ()
    if mesh is not None:
        from ..parallel.mesh import check_divisible, replicate, shard_batch

        check_divisible(mesh, n_prior, "n_prior particles")
        check_divisible(mesh, n_active, "n_active particles")
        if n_evidence:
            check_divisible(mesh, n_evidence, "n_evidence draws")
        state = replicate(mesh, state)
        _shard = lambda a: shard_batch(mesh, a)  # noqa: E731
    else:
        _shard = lambda a: a  # noqa: E731
    ll_fn = log_likelihood
    dtype = prior_lo.dtype
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    ndim = prior_lo.shape[0]
    lo_np = np.asarray(prior_lo, dtype=np.float64)
    hi_np = np.asarray(prior_hi, dtype=np.float64)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    log_prior_x = jnp.asarray(
        -np.sum(np.log(hi_np - lo_np)), dtype=dtype
    )

    logger.info(
        "SMC (persistent sampling): n_prior=%d, n_active=%d, ESS target %d, "
        "kernel %s", n_prior, n_active, n_effective, sample,
    )

    log_prior_fn = None
    if custom_prior is not None:
        if not hasattr(custom_prior, "log_prior_jax"):
            raise ValueError(
                "custom priors must expose a JAX-traceable log_prior_jax(x) "
                "(see utils.priors.ScipyPrior for scipy frozen-distribution "
                "lists); a numpy-only logpdf cannot enter the device "
                "programs and would silently be replaced by the uniform box"
            )
        log_prior_fn = custom_prior.log_prior_jax

    # the full set of knobs that shape the RESUMED evolution: everything
    # the per-iteration dynamics depend on, plus the parameter box (so two
    # different Chains sharing a directory cannot resume from each other's
    # state).  Evidence-phase knobs (n_evidence, defensive frac, dof) and
    # max_iterations are deliberately EXCLUDED: resuming with different
    # values there is a feature (recompute evidence / extend a capped run).
    ckpt_knobs = {
        "n_prior": n_prior, "n_active": n_active,
        "n_effective": n_effective, "n_total": n_total,
        "sample": sample, "seed": seed, "ndim": ndim,
        "n_max_steps": n_max_steps,
        "flow_fit_steps": flow_fit_steps,
        "flow_fit_steps_warm": flow_fit_steps_warm,
        "flow_fit_patience": flow_fit_patience,
        "flow_config": str(flow_config),
        "box_lo": tuple(float(v) for v in lo_np),
        "box_hi": tuple(float(v) for v in hi_np),
        "has_custom_prior": custom_prior is not None,
    }
    restored = None
    if resume and checkpoint_path is not None:
        try:
            restored = _load_smc_checkpoint(checkpoint_path, ckpt_knobs)
        except FileNotFoundError:
            logger.info(
                "resume=True but no SMC checkpoint at %s; starting fresh",
                checkpoint_path,
            )

    if restored is None:
        # Rejection-sampled into the box (see _draw_prior_in_box): batch 0
        # is exactly ~ pi restricted to the box; the accepted fraction
        # estimates the prior mass inside, which enters the mixture as
        # batch 0's log-normalizer below.
        x0, prior_frac_in = _draw_prior_in_box(
            custom_prior, rng, n_prior, lo_np, hi_np
        )
        if custom_prior is not None and prior_frac_in < 0.999:
            logger.warning(
                "custom prior has ~%.1f%% of its mass outside the sampling "
                "box; initial draws were rejection-sampled into the box and "
                "the evidence accounts for the truncation (log mass %.4f)",
                100.0 * (1.0 - prior_frac_in), np.log(prior_frac_in),
            )
        u0 = _shard(
            jnp.asarray(_to_unbounded_np(x0, lo_np, hi_np).astype(np_dtype))
        )
        _, logl0, _, logp_x0 = _eval_u(
            ll_fn, log_prior_fn, state, u0, prior_lo, prior_hi, log_prior_x
        )

        # persistent history (host side; the per-iteration MCMC phase is one
        # device program over the n_active particles)
        u_h = [np.asarray(u0, dtype=np.float64)]
        logl_h = [np.asarray(logl0, dtype=np.float64)]
        logp_h = [np.asarray(logp_x0, dtype=np.float64)]
        # batch 0's mixture component is the prior restricted to the box,
        # whose log-normalizer relative to the full prior is log(mass
        # inside) -- the rejection-sampling acceptance fraction estimates
        # exactly that.
        betas, logzs, counts = [0.0], [float(np.log(prior_frac_in))], [n_prior]

        key, k_flow = jax.random.split(key)
        flow_params = init_flow(k_flow, ndim, flow_config, dtype)
        rho = jnp.asarray(0.5, dtype)
        beta = 0.0
        iteration = 0
        total_steps = 0
    else:
        # full-state restore: the resumed run replays the EXACT evolution
        # an uninterrupted run would have produced (rng/key/flow/rho all
        # continue from the last completed iteration)
        u_h = list(restored["u_h"])
        logl_h = list(restored["logl_h"])
        logp_h = list(restored["logp_h"])
        betas = list(restored["betas"])
        logzs = list(restored["logzs"])
        counts = list(restored["counts"])
        beta = float(restored["beta"])
        iteration = int(restored["iteration"])
        total_steps = int(restored["total_steps"])
        prior_frac_in = float(restored["prior_frac_in"])
        rng = restored["rng"]
        key = _key_from_host(restored["key"])
        rho = jnp.asarray(restored["rho"], dtype)
        flow_params = jax.tree.map(
            lambda a: jnp.asarray(a), restored["flow_params"]
        )
        logger.info(
            "resumed SMC from checkpoint: iteration %d, beta %.4f, "
            "%d history particles", iteration, beta,
            sum(a.shape[0] for a in u_h),
        )

    flow_weights = _shard(jnp.asarray(np.ones(n_active, np_dtype)))
    cap = jnp.asarray(n_max_steps, jnp.int32)

    def save_checkpoint():
        """Persist the full driver state after a completed iteration (no-op
        without ``checkpoint_path``)."""
        if checkpoint_path is None:
            return
        _save_smc_checkpoint(checkpoint_path, {
            "version": 1,
            "knobs": ckpt_knobs,
            "u_h": u_h, "logl_h": logl_h, "logp_h": logp_h,
            "betas": betas, "logzs": logzs, "counts": counts,
            "beta": beta, "iteration": iteration,
            "total_steps": total_steps,
            "prior_frac_in": prior_frac_in,
            "rng": rng,
            "key": _key_to_host(key),
            "rho": np.asarray(jax.device_get(rho)),
            "flow_params": jax.tree.map(
                np.asarray, jax.device_get(flow_params)
            ),
        })

    def history():
        return np.concatenate(logl_h), np.concatenate(u_h)

    def logmeanexp(lw):
        m = lw.max()
        return m + np.log(np.mean(np.exp(lw - m)))

    def run_iteration(beta_target, lw, hl, hu):
        """Resample n_active from the ``lw``-weighted history, precondition,
        MCMC-move, append -- ONE fused device program (see
        :func:`_smc_iteration`): profiling on the flagship bench config
        showed the unfused flow-fit / dof / MCMC dispatches and their
        separate compiles dominating SMC wall time on this runtime."""
        nonlocal flow_params, rho, key, total_steps
        idx = _systematic_resample(rng, lw, n_active)
        u_np = hu[idx]
        u_act = _shard(jnp.asarray(u_np, dtype=dtype))
        logl_act = _shard(jnp.asarray(hl[idx], dtype=dtype))
        _, logdet_xu = _to_bounded_np(u_np, lo_np, hi_np)
        logp_u_act = _shard(jnp.asarray(
            (np.concatenate(logp_h)[idx] + logdet_xu).astype(np_dtype)
        ))

        key, k_it = jax.random.split(key)
        # first fit trains from the identity flow and needs the full budget;
        # subsequent fits warm-start from the previous iteration's flow on a
        # slowly-shifting population (the fit re-whitens the pre-layer each
        # call), so a fraction of the steps suffices -- the fit was 40% of
        # SMC wall time at full budget (profiled on TPU).  steps_fit is a
        # TRACED argument: both budgets run the one compiled program.
        warm = flow_fit_steps_warm
        if warm is None:
            # clamped so a small caller budget (e.g. flow_fit_steps=50)
            # never makes the warm-started fit LONGER than the cold one
            warm = min(flow_fit_steps, max(75, flow_fit_steps // 3))
        steps_fit = flow_fit_steps if iteration <= 1 else warm
        flow_params, u_new, logl_new, logp_x_new, rho, stats = _smc_iteration(
            ll_fn, log_prior_fn, state, flow_params, flow_weights, u_act,
            logl_act, logp_u_act, jnp.asarray(beta_target, dtype), rho, k_it,
            prior_lo, prior_hi, log_prior_x, cap,
            jnp.asarray(steps_fit, jnp.int32),
            kernel=sample, config=flow_config, patience=flow_fit_patience,
        )
        # one bundled host pull for the history append + every log figure
        u_np_new, logl_np_new, logp_np_new, stats_np = jax.device_get(
            (u_new, logl_new, logp_x_new, stats)
        )
        u_h.append(np.asarray(u_np_new, dtype=np.float64))
        logl_h.append(np.asarray(logl_np_new, dtype=np.float64))
        logp_h.append(np.asarray(logp_np_new, dtype=np.float64))
        steps, acc, flow_loss, rho_val = (
            int(stats_np[0]), float(stats_np[1]), float(stats_np[2]),
            float(stats_np[3]),
        )
        total_steps += steps
        return steps, acc, flow_loss, rho_val

    # ----------------------------------------------------- annealing phase
    while beta < 1.0 and iteration < max_iterations:
        iteration += 1
        hl, hu = history()
        lc, lm = _mixture_terms(hl, betas, logzs, counts)
        beta_new = _next_beta(lc, lm, beta, n_effective)
        lw = _log_weights(lc, lm, beta_new)
        logz_new = logmeanexp(lw)
        steps, acc, flow_loss, rho_val = run_iteration(beta_new, lw, hl, hu)
        betas.append(beta_new)
        logzs.append(logz_new)
        counts.append(n_active)
        beta = beta_new
        logger.info(
            "SMC iter %d: beta=%.4f, steps=%d, accept=%.3f, rho=%.3f, "
            "flow loss=%.2f, logz=%.3f", iteration, beta, steps, acc,
            rho_val, flow_loss, logz_new,
        )
        save_checkpoint()
    if beta < 1.0:
        logger.warning(
            "SMC: beta schedule did not converge in %d iterations", max_iterations
        )

    # ------------------------------------------------- posterior collection
    # keep iterating at beta = 1 until the history ESS reaches n_total.
    # lw1/hl/hu stay valid across the exit (the O(N*T) mixture matrix is
    # NOT recomputed after the loop -- the history only changes inside it)
    hl, hu = history()
    while True:
        lc, lm = _mixture_terms(hl, betas, logzs, counts)
        lw1 = _log_weights(lc, lm, 1.0)
        ess1 = _ess(lw1)
        if ess1 >= n_total or iteration >= max_iterations:
            break
        iteration += 1
        logz1 = logmeanexp(lw1)
        steps, acc, _, _ = run_iteration(1.0, lw1, hl, hu)
        betas.append(1.0)
        logzs.append(logz1)
        counts.append(n_active)
        logger.info(
            "SMC posterior iter %d: ESS %.0f / %d, steps=%d, accept=%.3f",
            iteration, ess1, n_total, steps, acc,
        )
        save_checkpoint()
        hl, hu = history()

    hp = np.concatenate(logp_h)
    ess_final = _ess(lw1)
    if iteration >= max_iterations and ess_final < n_total:
        logger.warning(
            "SMC: posterior collection hit max_iterations=%d with history "
            "ESS %.0f below the n_total=%d target; the returned weighted "
            "posterior is valid but less resolved than requested",
            max_iterations, ess_final, n_total,
        )
    logz_ps = logmeanexp(lw1)
    w = np.exp(lw1 - lw1.max())
    weights = w / w.sum()
    x_all = _to_bounded_np(hu, lo_np, hi_np)[0]
    logger.info(
        "SMC done: %d iterations, %d MCMC steps, %d particles, ESS %.0f",
        iteration, total_steps, len(hl), ess_final,
    )

    # ------------------------------------------------------------- evidence
    logz_err_ps = _ps_logz_err(lw1, counts, rng)
    logz, logz_err = logz_ps, logz_err_ps
    logz_is = logz_err_is = logz_khat = None
    logz_bridge = logz_err_bridge = None
    logz_source = "ps"
    if n_evidence and n_evidence > 0:
        # Defensive mixture proposal (see module docstring item 6):
        # n_t draws from an ANALYTIC moment-matched multivariate t fit to
        # the weighted history (a refit FLOW memorizes its resample --
        # measured +6.4 nats of density at fit particles vs held-out --
        # which biased every flow-based estimator low; see
        # _fit_t_proposal) plus n_def draws from the prior restricted to
        # the box.  Every draw is scored under BOTH mixture components.
        if not 0.0 <= evidence_defensive_frac < 1.0:
            raise ValueError(
                f"evidence_defensive_frac must be in [0, 1), got "
                f"{evidence_defensive_frac}"
            )
        n_def = int(round(evidence_defensive_frac * n_evidence))
        n_t = n_evidence - n_def
        t_prop = _fit_t_proposal(hu, lw1, float(evidence_base_dof))
        u_parts = []
        if n_t > 0:
            u_parts.append(_t_proposal_draw(rng, t_prop, n_t))
        if n_def > 0:
            x_def, _ = _draw_prior_in_box(
                custom_prior, rng, n_def, lo_np, hi_np
            )
            u_parts.append(_to_unbounded_np(x_def, lo_np, hi_np))
        u_all_np = np.concatenate(u_parts, axis=0)
        u_all = _shard(jnp.asarray(u_all_np.astype(np_dtype)))
        logl_ev, logp_u_ev = _evidence_eval(
            ll_fn, log_prior_fn, state, u_all,
            prior_lo, prior_hi, log_prior_x,
        )
        logl_np = np.asarray(logl_ev, np.float64)
        logp_u_np = np.asarray(logp_u_ev, np.float64)
        log_qt_np = _t_proposal_logpdf(t_prop, u_all_np)

        # defensive component density: the prior restricted to the box is
        # p_u(u) / frac_in in u-space (prior_frac_in from the init batch)
        def mix_logq(log_qt_vals, logp_u_vals):
            comps = []
            if n_t > 0:
                comps.append(np.log(n_t / n_evidence) + log_qt_vals)
            if n_def > 0:
                comps.append(
                    np.log(n_def / n_evidence) + logp_u_vals
                    - np.log(prior_frac_in)
                )
            return (
                comps[0] if len(comps) == 1
                else np.logaddexp(comps[0], comps[1])
            )

        log_w_ev = logl_np + logp_u_np - mix_logq(log_qt_np, logp_u_np)
        # non-finite weights contribute zero mass: NaN is arithmetic
        # garbage, and a +inf (an overflowing custom log-prior at a draw)
        # would otherwise turn the PSIS mean into exp(inf - inf) = NaN
        # and trip the cross-check with a spurious nan-vs-PS warning
        log_w_ev = np.where(np.isfinite(log_w_ev), log_w_ev, -np.inf)
        if np.all(~np.isfinite(log_w_ev)):
            logger.warning("evidence IS: no finite weights; keeping PS estimate")
        else:
            # Pareto-smooth the weight tail and read off the GPD index:
            # smoothing tames the variance the heaviest realized weights
            # inject; khat > EVIDENCE_KHAT_MAX means the tail was not
            # represented and the estimate is untrustworthy regardless
            log_w_sm, khat = _psis_smooth(log_w_ev)
            logz_khat = None if np.isnan(khat) else float(khat)
            m = log_w_sm.max()
            wv = np.exp(log_w_sm - m)
            logz_is = float(m + np.log(np.mean(wv)))
            # the standard IS delta-method standard error of log Z-hat:
            # Var[log Zhat] ~ Var[w] / (n E[w]^2); draws are iid from the
            # defensive mixture, and the PSIS smoothing + khat gate bound
            # the heavy-tail regime where this error underestimates
            logz_err_is = float(
                np.std(wv) / (np.mean(wv) * np.sqrt(n_evidence))
            )

            # ---- bridge DIAGNOSTIC (see _select_evidence: asymptotically
            # undercoverage-proof, but measured finite-sample-biased at
            # flagship sample sizes, so reported rather than selected).
            # The q side reuses the RAW defensive-mixture weights; the p
            # side scores a posterior resample of the history under the
            # SAME mixture -- logl/logp come from the history (no extra
            # likelihood evaluations) and the proposal density is
            # analytic, so this is pure host arithmetic.
            idx_p = _systematic_resample(rng, lw1, n_evidence)
            u_p_np = hu[idx_p]
            log_qt_p = _t_proposal_logpdf(t_prop, u_p_np)
            logp_u_p = hp[idx_p] + _to_bounded_np(u_p_np, lo_np, hi_np)[1]
            lw_p = hl[idx_p] + logp_u_p - mix_logq(log_qt_p, logp_u_p)
            logz_bridge = _bridge_logz(log_w_ev, lw_p, logz_ps)
            logz_err_bridge = (
                _bridge_err(log_w_ev, lw_p, logz_bridge, rng)
                if np.isfinite(logz_bridge) else float("nan")
            )
            if not (np.isfinite(logz_bridge)
                    and np.isfinite(logz_err_bridge)):
                logz_bridge = logz_err_bridge = None

            logz, logz_err, logz_source, is_unreliable = _select_evidence(
                logz_ps, logz_err_ps, logz_is, logz_err_is, logz_khat
            )
            fmt = lambda v: "n/a" if v is None else f"{v:.3f}"  # noqa: E731
            if is_unreliable:
                logger.warning(
                    "evidence: the IS refinement (%s +- %s, khat %s) "
                    "disagrees with the persistent-sampling estimate "
                    "%.3f +- %.3f beyond 3 sigma -- reporting the PS "
                    "estimate with error %.3f (bridge diagnostic: "
                    "%s +- %s)",
                    fmt(logz_is), fmt(logz_err_is), fmt(logz_khat),
                    logz_ps, logz_err_ps, logz_err,
                    fmt(logz_bridge), fmt(logz_err_bridge),
                )
            else:
                logger.info(
                    "evidence: PS %.3f +- %.3f, IS %s +- %s (khat %s), "
                    "bridge diagnostic %s +- %s -- source %s",
                    logz_ps, logz_err_ps, fmt(logz_is), fmt(logz_err_is),
                    fmt(logz_khat), fmt(logz_bridge), fmt(logz_err_bridge),
                    logz_source,
                )

    return {
        "samples": x_all,
        "weights": weights,
        "logl": hl,
        "logp": hp,
        "logz": float(logz),
        "logz_err": float(logz_err),
        "logz_source": logz_source,
        "logz_ps": float(logz_ps),
        "logz_err_ps": float(logz_err_ps),
        "logz_is": None if logz_is is None else float(logz_is),
        "logz_err_is": None if logz_err_is is None else float(logz_err_is),
        "logz_khat": logz_khat,
        "logz_bridge": (
            None if logz_bridge is None else float(logz_bridge)
        ),
        "logz_err_bridge": (
            None if logz_err_bridge is None else float(logz_err_bridge)
        ),
        "beta_iterations": iteration,
        "ess": float(ess_final),
        "total_mcmc_steps": total_steps,
    }
