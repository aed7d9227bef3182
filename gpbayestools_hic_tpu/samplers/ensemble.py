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
posteriors; the reference-default stretch move stays the default.

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


def _half_update(key, active, passive, lp_active, log_prob_fn, a, move):
    """Move ``active`` walkers against the ``passive`` half."""
    n_active = active.shape[0]
    ndim = active.shape[1]
    key_z, key_pick, key_acc = jax.random.split(key, 3)
    if move == "stretch":
        u = jax.random.uniform(key_z, (n_active,), dtype=active.dtype)
        z = ((a - 1.0) * u + 1.0) ** 2 / a
        picks = jax.random.randint(key_pick, (n_active,), 0, passive.shape[0])
        partners = passive[picks]
        proposal = partners + z[:, None] * (active - partners)
        log_hastings = (ndim - 1.0) * jnp.log(z)
    elif move == "de":
        # differential evolution (emcee DEMove semantics): x' = x + g (a - b)
        # with g = 2.38 / sqrt(2 d), occasionally g = 1 for mode jumps, plus
        # a tiny isotropic jitter; symmetric proposal -> no Hastings term
        k_pick2, k_jump, k_eps = jax.random.split(key_z, 3)
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
        log_hastings = jnp.zeros((n_active,), active.dtype)
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
) -> EnsembleResult:
    """Run ``nsteps`` stretch-move updates from walker positions ``x0``.

    ``log_prob_fn`` maps (m, ndim) -> (m,) and must be traceable (the whole
    sampler is one compiled program; each step calls it twice on half the
    ensemble).  ``x0`` (nwalkers, ndim) with nwalkers even.

    Pass posterior arrays via ``state`` (then ``log_prob_fn(state, x)``)
    rather than closing over device arrays -- closure-captured arrays pay a
    large per-call re-upload penalty on some runtimes (see
    models/emulator.py).
    """
    if state is not None:
        base_fn = log_prob_fn
        log_prob_fn = lambda x: base_fn(state, x)  # noqa: E731
    nwalkers, ndim = x0.shape
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

    keys = jax.random.split(key, nsteps)
    (xf, lpf), (chain, lps, accs) = lax.scan(step, (x0, lp0), keys)
    return EnsembleResult(
        chain=jnp.transpose(chain, (1, 0, 2)),
        log_prob=lps.T,
        acceptance=jnp.mean(accs.astype(x0.dtype), axis=0),
        final_state=xf,
        final_log_prob=lpf,
    )
