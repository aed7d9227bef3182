"""Affine-invariant ensemble sampler (Goodman & Weare stretch move).

From-scratch emcee-parity sampler (reference uses
``emcee.EnsembleSampler`` with a vectorized pool trick, src/mcmc.py:68-92,
335-342, 372-374).  Semantics matched:

- stretch move with scale ``a = 2``: ``z = ((a-1) u + 1)^2 / a`` so
  ``g(z) ~ 1/sqrt(z)`` on ``[1/a, a]``;
- two-half ("red-black") ensemble update: each half is moved against the
  *current* state of the other half, so one step costs two batched
  log-posterior evaluations -- exactly emcee's parallelizable variant;
- acceptance ``log r < (ndim - 1) log z + logp(Y) - logp(X)``.

Beyond reference parity, ``move="de"`` selects a differential-evolution
proposal (emcee ``DEMove`` semantics) which mixes much faster on correlated
posteriors, ``move="snooker"`` the DE-snooker proposal (the ter Braak &
Vrugt 2008 form: a line move along the UNIT direction through a third
walker with the ``(d-1) log(|Y-z|/|X-z|)`` Jacobian factor -- emcee's
``DESnookerMove`` differs in detail, scaling its step by ``|X-z|^{1/2}``
via a non-unit direction and halving the Jacobian exponent; both leave
the target invariant), and
``move="de-snooker"`` the classic 80/20 DE+snooker mixture (each walker
independently draws its kernel each step -- both kernels leave the target
invariant, so the fixed mixture does too).  The reference-default stretch
move stays the default.

TPU-first: the whole run is one ``lax.scan`` over steps with the walker
batch vmapped inside the posterior; walkers can be sharded over a device
mesh by passing a sharded initial state (see :mod:`..parallel.mesh`).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class EnsembleResult(NamedTuple):
    chain: jnp.ndarray        # (nwalkers, nsteps, ndim)
    log_prob: jnp.ndarray     # (nwalkers, nsteps)
    acceptance: jnp.ndarray   # (nwalkers,) accepted-move fraction
    final_state: jnp.ndarray  # (nwalkers, ndim)
    final_log_prob: jnp.ndarray  # (nwalkers,)


def _propose_stretch(key, active, passive, a):
    n_active, ndim = active.shape
    key_z, key_pick = jax.random.split(key)
    u = jax.random.uniform(key_z, (n_active,), dtype=active.dtype)
    z = ((a - 1.0) * u + 1.0) ** 2 / a
    picks = jax.random.randint(key_pick, (n_active,), 0, passive.shape[0])
    partners = passive[picks]
    proposal = partners + z[:, None] * (active - partners)
    return proposal, (ndim - 1.0) * jnp.log(z)


def _propose_de(key, active, passive):
    # differential evolution: x' = x + g (a - b) with g = 2.38 / sqrt(2 d)
    # and a tiny isotropic jitter (emcee DEMove), PLUS a 10% g = 1
    # mode-jump mixture -- ter Braak (2006)'s recommendation, which emcee's
    # DEMove does NOT include (deliberate divergence: it helps multimodal
    # targets and stays a symmetric proposal -> no Hastings term either
    # way, but acceptance/tau comparisons against emcee's DEMove will
    # differ slightly)
    n_active, ndim = active.shape
    key_pick, k_pick2, k_jump, k_eps = jax.random.split(key, 4)
    n_pass = passive.shape[0]
    ia = jax.random.randint(key_pick, (n_active,), 0, n_pass)
    ib = jnp.mod(
        ia + 1 + jax.random.randint(k_pick2, (n_active,), 0, n_pass - 1),
        n_pass,
    )
    gamma0 = 2.38 / jnp.sqrt(2.0 * ndim)
    jump = jax.random.uniform(k_jump, (n_active,), dtype=active.dtype) < 0.1
    gamma = jnp.where(jump, 1.0, gamma0)
    eps = 1e-5 * jax.random.normal(k_eps, active.shape, active.dtype)
    proposal = active + gamma[:, None] * (passive[ia] - passive[ib]) + eps
    return proposal, jnp.zeros((n_active,), active.dtype)


def _propose_snooker(key, active, passive):
    # DE-snooker (ter Braak & Vrugt 2008 unit-direction form; see module
    # docstring for how emcee's DESnookerMove differs): slide X
    # along the unit line u through an anchor walker z by
    # gamma_s (u.z1 - u.z2); the line move needs the Jacobian factor
    # (d - 1) log(|Y - z| / |X - z|) to preserve detailed balance.
    # Partners are drawn from the passive half with iz != i1 enforced by the
    # mod trick; i1 == i2 (prob ~ 1/n) degenerates to a no-op proposal,
    # which is harmlessly accepted in place.
    n_active, ndim = active.shape
    kz, k1, k2 = jax.random.split(key, 3)
    n_pass = passive.shape[0]
    iz = jax.random.randint(kz, (n_active,), 0, n_pass)
    i1 = jnp.mod(
        iz + 1 + jax.random.randint(k1, (n_active,), 0, n_pass - 1), n_pass
    )
    i2 = jnp.mod(
        iz + 1 + jax.random.randint(k2, (n_active,), 0, n_pass - 1), n_pass
    )
    z = passive[iz]
    delta = active - z
    norm = jnp.linalg.norm(delta, axis=1)
    # coincident walkers (norm 0) have no line direction: keep the proposal
    # at X (safe no-op) instead of producing NaNs
    safe = jnp.maximum(norm, jnp.asarray(1e-30, active.dtype))
    u = delta / safe[:, None]
    gamma_s = 1.7  # emcee's DESnookerMove default
    step = gamma_s * jnp.einsum("ij,ij->i", u, passive[i1] - passive[i2])
    step = jnp.where(norm > 0, step, 0.0)
    proposal = active + step[:, None] * u
    ynorm = jnp.abs(norm + step)  # |Y - z| along the same line
    log_hastings = (ndim - 1.0) * (
        jnp.log(jnp.maximum(ynorm, 1e-30)) - jnp.log(safe)
    )
    return proposal, log_hastings


def _half_update(key, active, passive, lp_active, log_prob_fn, a, move):
    """Move ``active`` walkers against the ``passive`` half."""
    n_active = active.shape[0]
    key_z, key_acc = jax.random.split(key)
    if move == "stretch":
        proposal, log_hastings = _propose_stretch(key_z, active, passive, a)
    elif move == "de":
        proposal, log_hastings = _propose_de(key_z, active, passive)
    elif move == "snooker":
        proposal, log_hastings = _propose_snooker(key_z, active, passive)
    elif move == "de-snooker":
        # classic 80/20 DE + snooker mixture: each walker draws its kernel
        # independently each step (both kernels are target-invariant, so any
        # fixed mixture is too); only the SELECTED proposal is evaluated
        k_sel, k_de, k_sn = jax.random.split(key_z, 3)
        p_de, lh_de = _propose_de(k_de, active, passive)
        p_sn, lh_sn = _propose_snooker(k_sn, active, passive)
        use_de = (
            jax.random.uniform(k_sel, (n_active,), dtype=active.dtype) < 0.8
        )
        proposal = jnp.where(use_de[:, None], p_de, p_sn)
        log_hastings = jnp.where(use_de, lh_de, lh_sn)
    else:
        raise ValueError(f"unknown move: {move}")
    lp_prop = log_prob_fn(proposal)
    log_ratio = log_hastings + lp_prop - lp_active
    accept = (
        jnp.log(jax.random.uniform(key_acc, (n_active,), dtype=active.dtype))
        < log_ratio
    )
    new_active = jnp.where(accept[:, None], proposal, active)
    new_lp = jnp.where(accept, lp_prop, lp_active)
    return new_active, new_lp, accept


@partial(jax.jit, static_argnames=("log_prob_fn", "nsteps", "a", "move"))
def run_ensemble(
    log_prob_fn: Callable[..., jnp.ndarray],
    x0: jnp.ndarray,
    nsteps: int,
    key: jax.Array,
    *,
    a: float = 2.0,
    move: str = "stretch",
    state=None,
    step_offset: int = 0,
) -> EnsembleResult:
    """Run ``nsteps`` stretch-move updates from walker positions ``x0``.

    ``log_prob_fn`` maps (m, ndim) -> (m,) and must be traceable (the whole
    sampler is one compiled program; each step calls it twice on half the
    ensemble).  ``x0`` (nwalkers, ndim) with nwalkers even.

    ``step_offset`` shifts the per-step key indices (``fold_in(key,
    step_offset + i)``) so a run split into segments with the SAME base
    key reproduces the unsegmented run exactly -- used by the
    status-logging chunking in :meth:`Chain._run_segments`.

    Pass posterior arrays via ``state`` (then ``log_prob_fn(state, x)``)
    rather than closing over device arrays -- closure-captured arrays pay a
    large per-call re-upload penalty on some runtimes (see
    models/emulator.py).
    """
    if state is not None:
        base_fn = log_prob_fn
        log_prob_fn = lambda x: base_fn(state, x)  # noqa: E731
    nwalkers, ndim = x0.shape
    # minimum ensemble sizes (emcee raises similarly): de needs two
    # DISTINCT partners per half (>= 4 walkers) and snooker an anchor plus
    # two partners (>= 6) -- below that the mod-trick index draws collide
    # and the move silently degenerates to frozen walkers at acceptance ~1
    min_walkers = {"stretch": 4, "de": 4, "snooker": 6, "de-snooker": 6}
    need = min_walkers.get(move, 4)
    if nwalkers < need:
        raise ValueError(
            f"move={move!r} needs at least {need} walkers (got {nwalkers}): "
            "smaller ensembles make the partner draws collide and freeze "
            "the chain"
        )
    if nwalkers % 2:
        # the red-black update splits the ensemble in halves; emcee raises
        # for odd counts too -- silently running 2-vs-3 halves would be a
        # quiet divergence from the documented (and emcee-parity) contract
        raise ValueError(
            f"nwalkers must be even (got {nwalkers}): the ensemble updates "
            "half against half"
        )
    half = nwalkers // 2
    lp0 = log_prob_fn(x0)

    def step(carry, key):
        x, lp = carry
        k1, k2 = jax.random.split(key)
        first, second = x[:half], x[half:]
        lp_first, lp_second = lp[:half], lp[half:]
        first, lp_first, acc1 = _half_update(
            k1, first, second, lp_first, log_prob_fn, a, move
        )
        second, lp_second, acc2 = _half_update(
            k2, second, first, lp_second, log_prob_fn, a, move
        )
        x = jnp.concatenate([first, second])
        lp = jnp.concatenate([lp_first, lp_second])
        acc = jnp.concatenate([acc1, acc2])
        return (x, lp), (x, lp, acc)

    # Per-step keys by ABSOLUTE step index (fold_in) rather than one
    # split(key, nsteps): a run chunked into segments (the status-logging
    # cadence in Chain._run_segments) then consumes the identical stream as
    # the unchunked run -- the log frequency must not change the samples.
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        step_offset + jnp.arange(nsteps)
    )
    (xf, lpf), (chain, lps, accs) = lax.scan(step, (x0, lp0), keys)
    return EnsembleResult(
        chain=jnp.transpose(chain, (1, 0, 2)),
        log_prob=lps.T,
        acceptance=jnp.mean(accs.astype(x0.dtype), axis=0),
        final_state=xf,
        final_log_prob=lpf,
    )
