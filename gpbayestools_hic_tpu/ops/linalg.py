"""Dense linear algebra for GP emulation and MCMC likelihoods.

Replaces the reference's raw-LAPACK multivariate-normal log-likelihood
(``dpotrf``/``dpotrs``, reference: src/mcmc.py:23-65) with batched, jittable
XLA programs.  The #1 hot path of the whole framework is
:func:`mvn_loglike_batch`: one (nobs, nobs) Cholesky *per walker per MCMC
step*.  The reference evaluates these serially via Python ``map``
(src/mcmc.py:217); here the batch dimension is vmapped so XLA lowers it to
a single batched Cholesky + triangular-solve program on device, and walkers
can additionally be sharded across chips (see :mod:`..parallel.mesh`).

The reference's dead ``elif info < 0`` duplicate branch (src/mcmc.py:44-54)
is "fixed" by construction: inside jit there are no data-dependent raises, so
non-PD inputs surface as NaN which MCMC treats as rejection; a jitter rescue
is applied first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..config import chol_jitter


def solve_lower_triangular(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L x = b with L lower triangular. b: (n,) or (n, k)."""
    b2 = b[:, None] if b.ndim == 1 else b
    x = lax.linalg.triangular_solve(
        chol, b2, left_side=True, lower=True, transpose_a=False
    )
    return x[:, 0] if b.ndim == 1 else x


def solve_cholesky(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given A = L L^T. b: (n,) or (n, k)."""
    b2 = b[:, None] if b.ndim == 1 else b
    y = lax.linalg.triangular_solve(chol, b2, left_side=True, lower=True)
    x = lax.linalg.triangular_solve(
        chol, y, left_side=True, lower=True, transpose_a=True
    )
    return x[:, 0] if b.ndim == 1 else x


def cholesky_jittered(a: jnp.ndarray, jitter_scale: float | None = None) -> jnp.ndarray:
    """Cholesky with a one-shot diagonal jitter rescue.

    Factor ``a``; if any diagonal entry of the factor is non-finite, refactor
    ``a + jitter * mean(diag(a)) * I``.  Fully traceable (no data-dependent
    control flow beyond a ``where`` select); NaN propagates if even the
    jittered matrix is non-PD, which downstream treats as -inf likelihood.
    """
    if jitter_scale is None:
        jitter_scale = chol_jitter(a.dtype)
    chol = jnp.linalg.cholesky(a)
    bad = ~jnp.all(jnp.isfinite(jnp.diagonal(chol, axis1=-2, axis2=-1)))
    eye = jnp.eye(a.shape[-1], dtype=a.dtype)
    bump = jitter_scale * jnp.mean(jnp.diagonal(a, axis1=-2, axis2=-1)) * eye
    chol_rescued = jnp.linalg.cholesky(a + bump)
    return jnp.where(bad, chol_rescued, chol)


def mvn_loglike(y: jnp.ndarray, cov: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized MVN log-likelihood of difference vector ``y`` under ``cov``.

        log p = -1/2 y^T C^-1 y - sum(log diag(L)),   C = L L^T

    Matches the reference's ``mvn_loglike`` semantics (src/mcmc.py:23-65,
    algorithm 2.1 of Rasmussen & Williams) without the -n/2 log(2 pi)
    constant.  Returns -inf where the factorization failed (NaN guard).
    """
    chol = cholesky_jittered(cov)
    alpha = solve_lower_triangular(chol, y)
    quad = jnp.sum(alpha * alpha)
    logdet_half = jnp.sum(jnp.log(jnp.diagonal(chol)))
    lp = -0.5 * quad - logdet_half
    return jnp.where(jnp.isfinite(lp), lp, -jnp.inf)


def mvn_loglike_fast(y: jnp.ndarray, cov: jnp.ndarray) -> jnp.ndarray:
    """Like :func:`mvn_loglike` but without the jitter-rescue second
    factorization: a non-PD covariance yields NaN -> -inf directly, which is
    the correct MCMC semantics (rejection).  Use on covariances that carry an
    explicit diagonal (experimental variances / alpha), where the rescue
    would only double the Cholesky cost."""
    chol = jnp.linalg.cholesky(cov)
    alpha = solve_lower_triangular(chol, y)
    quad = jnp.sum(alpha * alpha)
    logdet_half = jnp.sum(jnp.log(jnp.diagonal(chol)))
    lp = -0.5 * quad - logdet_half
    return jnp.where(jnp.isfinite(lp), lp, -jnp.inf)


def mvn_loglike_batch(y: jnp.ndarray, cov: jnp.ndarray) -> jnp.ndarray:
    """Batched MVN log-likelihood: y (b, n), cov (b, n, n) -> (b,).

    One fused device program: batched Cholesky + batched triangular solve +
    reductions.  This is the TPU replacement for the reference's
    ``map(mvn_loglike, dY, cov)`` Python loop (src/mcmc.py:217).  Uses the
    no-rescue fast path (non-PD -> -inf)."""
    return jax.vmap(mvn_loglike_fast)(y, cov)


def mvn_loglike_diagcov_batch(y: jnp.ndarray, var: jnp.ndarray) -> jnp.ndarray:
    """Diagonal-covariance fast path: y (b, n), var (b, n) -> (b,)."""
    quad = jnp.sum(y * y / var, axis=-1)
    logdet_half = 0.5 * jnp.sum(jnp.log(var), axis=-1)
    lp = -0.5 * quad - logdet_half
    return jnp.where(jnp.isfinite(lp), lp, -jnp.inf)
