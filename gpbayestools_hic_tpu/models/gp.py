"""Batched exact Gaussian-process regression, TPU-first.

From-scratch replacement for the per-PC ``sklearn.GaussianProcessRegressor``
loop in the reference (src/emulator.py:309-315).  The reference fits ``npc``
independent GPs sequentially, each running scipy L-BFGS-B over kernel
hyperparameters where every objective evaluation is an O(n^3) Cholesky.
Here all PCs *and* all optimizer restarts are one vmapped batch: XLA lowers
the whole hyperparameter search to a single device program of batched
Gram-matrix builds (MXU matmuls) + batched Cholesky factorizations.

Numerics match sklearn GPR with ``kernel = C * (RBF|Matern1.5) + White``,
``alpha = 0.1``:

- log marginal likelihood: ``-1/2 y^T K^-1 y - sum log L_ii - n/2 log 2pi``
  with ``K = kernel(X) + alpha I`` (white noise inside the kernel, alpha on
  top -- both on the diagonal, exactly as sklearn composes them);
- hyperparameters optimized in log space under box bounds
  (:mod:`..ops.lbfgsb`), restarts sampled uniformly in the log-space box
  (sklearn's restart rule);
- predictive mean ``k_*^T K^-1 y``; predictive covariance
  ``k(X_*, X_*) - v^T v`` with ``v = L^-1 k(X, X_*)`` -- includes the white
  noise level on its diagonal but NOT alpha (sklearn convention).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.kernels import KernelConfig, kernel_fn, kernel_diag, init_kernel_params, default_bounds
from ..ops.lbfgsb import lbfgsb_minimize
from ..ops.linalg import cholesky_jittered, solve_lower_triangular


class GPConfig(NamedTuple):
    """Static GP configuration (hashable, safe as a jit static arg)."""

    kernel: KernelConfig = KernelConfig("RBF")
    alpha: float = 0.1  # fixed diagonal regularization (sklearn GPR alpha)


class GPState(NamedTuple):
    """Trained state for a batch of GPs sharing the same inputs.

    Leading axis of every field is the GP/batch axis (``npc``).

    ``kinv`` (the explicit K^-1) is precomputed at fit time so that the
    predictive variance is two MXU matmuls instead of a sequential
    triangular solve -- on TPU the solve is ~50x slower than the matmul at
    flagship scale (n=1000, m=128).  K carries the alpha=0.1 + white-noise
    diagonal, so the inverse is well-conditioned even in f32.
    """

    params: dict          # {"log_amp": (b,), "log_ls": (b, d), "log_noise": (b,)}
    x: jnp.ndarray        # (n, d) shared training inputs
    y: jnp.ndarray        # (b, n) training targets
    chol: jnp.ndarray     # (b, n, n) Cholesky of K
    alpha_vec: jnp.ndarray  # (b, n) K^-1 y
    kinv: jnp.ndarray     # (b, n, n) explicit K^-1 (for MXU-friendly predict)
    lml: jnp.ndarray      # (b,) log marginal likelihood at the optimum


def _build_k(params, x, config: GPConfig, noise_diag=None):
    k = kernel_fn(params, x, config=config.kernel, include_noise=True)
    k = k + config.alpha * jnp.eye(x.shape[0], dtype=x.dtype)
    if noise_diag is not None:
        # heteroskedastic known simulation noise (stochastic-kriging / PCSK
        # semantics: surmise passes simsd per observable and design point,
        # reference src/emulator_BAND.py:276-282)
        k = k + jnp.diag(noise_diag)
    return k


def gp_nll(params: dict, x: jnp.ndarray, y: jnp.ndarray, config: GPConfig,
           noise_diag=None) -> jnp.ndarray:
    """Negative log marginal likelihood of one GP (differentiable).

    Uses a plain (no jitter-rescue) Cholesky: this runs inside every L-BFGS
    line-search trial, and the non-finite guard below already converts a
    failed factorization into a rejected step -- the rescue would only
    double the factorization cost of hyperparameter search.  The final
    state build (:func:`_chol_and_white`) keeps the rescue."""
    n = x.shape[0]
    k = _build_k(params, x, config, noise_diag)
    chol = jnp.linalg.cholesky(k)
    alpha_vec = solve_lower_triangular(chol, y)
    quad = jnp.sum(alpha_vec * alpha_vec)
    logdet_half = jnp.sum(jnp.log(jnp.diagonal(chol)))
    nll = 0.5 * quad + logdet_half + 0.5 * n * jnp.log(2.0 * jnp.pi)
    # Guard: non-finite (failed Cholesky at extreme hyperparams) -> huge
    # finite penalty so L-BFGS line searches reject the step smoothly.
    return jnp.where(jnp.isfinite(nll), nll, jnp.asarray(1e30, nll.dtype))


def _pack(params):
    return jnp.concatenate([
        params["log_amp"][None], params["log_ls"], params["log_noise"][None]
    ])


def _unpack(vec, d):
    return {
        "log_amp": vec[0],
        "log_ls": vec[1 : 1 + d],
        "log_noise": vec[1 + d],
    }


@partial(jax.jit, static_argnames=("config", "nrestarts", "maxiter"))
def gp_fit(
    x: jnp.ndarray,
    y_batch: jnp.ndarray,
    ptp: jnp.ndarray,
    *,
    config: GPConfig = GPConfig(),
    nrestarts: int = 0,
    key: jax.Array | None = None,
    maxiter: int = 200,
    noise_diag: jnp.ndarray | None = None,
) -> GPState:
    """Fit ``npc`` independent GPs on shared inputs, all in one device program.

    ``x`` (n, d), ``y_batch`` (npc, n).  ``ptp`` (d,) sets the reference
    initialization (length scales = parameter ranges) and bounds.  With
    ``nrestarts > 0``, each GP additionally starts from ``nrestarts`` points
    sampled uniformly in the log-bound box and the best optimum wins
    (sklearn ``n_restarts_optimizer`` semantics).  ``noise_diag`` (npc, n)
    adds known per-point noise variances to each GP's Gram diagonal
    (stochastic kriging / PCSK).
    """
    dtype = x.dtype
    d = x.shape[1]
    npc = y_batch.shape[0]
    init = init_kernel_params(ptp, dtype=dtype)
    lower_p, upper_p = default_bounds(ptp, kind=config.kernel.kind, dtype=dtype)
    lower = _pack(lower_p)
    upper = _pack(upper_p)
    theta0 = _pack(init)

    # Starting points: (nstarts, dim) -- first from the reference default,
    # the rest uniform in the log box.
    if nrestarts > 0:
        if key is None:
            key = jax.random.PRNGKey(0)
        u = jax.random.uniform(key, (nrestarts, theta0.shape[0]), dtype=dtype)
        randoms = lower + u * (upper - lower)
        starts = jnp.concatenate([theta0[None], randoms], axis=0)
    else:
        starts = theta0[None]

    if noise_diag is None:
        noise_diag = jnp.zeros_like(y_batch)

    def fit_one(y, nd, t0):
        def nll_vec(vec):
            return gp_nll(_unpack(vec, d), x, y, config, nd)

        res = lbfgsb_minimize(nll_vec, t0, lower, upper, maxiter=maxiter)
        return res.x, res.fun

    # vmap over (PC x restart).
    fit_grid = jax.vmap(
        jax.vmap(fit_one, in_axes=(None, None, 0)), in_axes=(0, 0, None)
    )
    thetas, nlls = fit_grid(y_batch, noise_diag, starts)  # (npc, nstarts, dim)
    best = jnp.argmin(nlls, axis=1)
    theta_best = jnp.take_along_axis(thetas, best[:, None, None], axis=1)[:, 0, :]
    params = jax.vmap(lambda v: _unpack(v, d))(theta_best)

    return finalize_gp_state(params, x, y_batch, config, noise_diag)


def finalize_gp_state(
    params: dict,
    x: jnp.ndarray,
    y_batch: jnp.ndarray,
    config: GPConfig,
    noise_diag: jnp.ndarray | None = None,
) -> GPState:
    """Build the trained-state arrays (Cholesky, K^-1 y, explicit K^-1, LML)
    for a batch of GPs with known hyperparameters.

    Shared by :func:`gp_fit` and the reference-emulator importer
    (models/migrate.py), so the jitter-rescue and MXU-friendly K^-1
    construction exist in exactly one place.
    """
    dtype = x.dtype
    if noise_diag is None:
        noise_diag = jnp.zeros_like(y_batch)
    chols, whitened = jax.vmap(
        lambda p, y, nd: _chol_and_white(p, x, y, config, nd)
    )(params, y_batch, noise_diag)
    alpha_vecs = jax.vmap(
        lambda c, w: jax.lax.linalg.triangular_solve(
            c, w[:, None], left_side=True, lower=True, transpose_a=True
        )[:, 0]
    )(chols, whitened)
    n = x.shape[0]
    eye = jnp.eye(n, dtype=dtype)
    kinvs = jax.vmap(
        lambda c: jax.lax.linalg.triangular_solve(
            c,
            jax.lax.linalg.triangular_solve(c, eye, left_side=True, lower=True),
            left_side=True, lower=True, transpose_a=True,
        )
    )(chols)
    lml = (
        -0.5 * jnp.sum(whitened * whitened, axis=1)
        - jnp.sum(jnp.log(jnp.diagonal(chols, axis1=-2, axis2=-1)), axis=1)
        - 0.5 * n * jnp.log(2.0 * jnp.pi)
    )
    return GPState(
        params=params, x=x, y=y_batch, chol=chols, alpha_vec=alpha_vecs,
        kinv=kinvs, lml=lml,
    )


def _chol_and_white(p, x, y, config, noise_diag=None):
    k = _build_k(p, x, config, noise_diag)
    chol = cholesky_jittered(k)
    w = solve_lower_triangular(chol, y)
    return chol, w


@jax.custom_vjp
def _quad_mean_var(kstar, kinv, alpha_vec):
    """(kstar^T alpha, diag(kstar^T Kinv kstar)) with a hand-written VJP.

    The quadratic form's reverse pass under plain AD costs a SECOND
    (n, n) @ (n, m) matmul (kinv^T @ ct_w) -- the single largest cost of a
    posterior gradient (HMC/MALA/Langevin).  But the per-column cotangent
    ct_q is a scalar per query, so by symmetry of Kinv:

        kinv^T @ (kstar * ct_q) = (kinv @ kstar) * ct_q = w * ct_q

    i.e. d q / d kstar = 2 w, which the forward already computed.  The
    custom VJP reuses ``w`` and eliminates the backward matmul entirely
    (measured: posterior value_and_grad drops from ~3x to ~1.6x a forward
    eval on the flagship problem).  Forward-mode (jacfwd) callers must use
    the vanilla path -- custom_vjp functions cannot be forward-differentiated
    (see gp_predict's ``fast_grad`` flag).
    """
    w = kinv @ kstar
    return kstar.T @ alpha_vec, jnp.sum(kstar * w, axis=0)


def _quad_fwd(kstar, kinv, alpha_vec):
    w = kinv @ kstar
    out = (kstar.T @ alpha_vec, jnp.sum(kstar * w, axis=0))
    return out, (w, alpha_vec, kinv, kstar)


def _quad_bwd(res, cts):
    w, alpha_vec, kinv, kstar = res
    ct_mean, ct_q = cts
    ct_kstar = alpha_vec[:, None] * ct_mean[None, :] + 2.0 * w * ct_q[None, :]
    # exact cotangents toward the state arrays too (these DO cost a matmul,
    # but XLA dead-code-eliminates them when the caller differentiates only
    # w.r.t. the query points -- the sampling case)
    ct_kinv = (kstar * ct_q[None, :]) @ kstar.T
    ct_alpha = kstar @ ct_mean
    return ct_kstar, ct_kinv, ct_alpha


_quad_mean_var.defvjp(_quad_fwd, _quad_bwd)


@partial(jax.jit, static_argnames=("config", "full_cov", "fast_grad"))
def gp_predict(
    state: GPState,
    xq: jnp.ndarray,
    *,
    config: GPConfig = GPConfig(),
    full_cov: bool = False,
    fast_grad: bool = False,
):
    """Posterior mean and (co)variance of each GP in the batch at ``xq``.

    Returns ``(mean, var)`` with mean (b, m) and var (b, m), or
    ``(mean, cov)`` with cov (b, m, m) when ``full_cov``.  The predictive
    covariance includes the fitted white-noise level on the diagonal but not
    alpha (sklearn ``predict(return_cov=True)`` convention).  Variances are
    clipped at zero like sklearn does.

    ``fast_grad`` (diag path only) routes the mean/quadratic-form pair
    through :func:`_quad_mean_var`, whose hand-written VJP reuses the
    forward's ``Kinv kstar`` product and so halves the dominant matmul cost
    of a reverse-mode gradient.  Identical values and reverse gradients;
    NOT forward-differentiable (jacfwd callers use the default path).
    """

    def one(params, kinv, alpha_vec):
        kstar = kernel_fn(
            params, state.x, xq, config=config.kernel, include_noise=False
        )  # (n, m)
        if fast_grad and not full_cov:
            mean, q = _quad_mean_var(kstar, kinv, alpha_vec)
            kdiag = kernel_diag(params, xq, config=config.kernel, include_noise=True)
            return mean, jnp.maximum(kdiag - q, 0.0)
        mean = kstar.T @ alpha_vec
        # K^-1 k_* as a matmul (MXU) rather than a sequential triangular
        # solve; see GPState.kinv.  This is ~99% of the posterior-eval FLOPs
        # (36 x (1000,1000)@(1000,512) per flagship walker batch), so its
        # matmul precision IS the eval throughput -- and FULL precision is
        # REQUIRED.  Measured ladder on TPU v5e (norm rel err of the product
        # vs f64, then end-to-end posterior error via tools/tpu_validation):
        #   default (1-pass bf16):  2.4e-3 product err -> ~30% variance err,
        #           corrupted posterior (reverted in round 1);
        #   high    (3-pass):       1.3e-5 product err, 1.18x faster end to
        #           end (137 -> 162 ensemble steps/s) -- but the posterior
        #           error blows up to max 2.21 / median 0.10 log-units
        #           (tolerance 0.5): the Woodbury var = kdiag - sum
        #           cancellation amplifies the product error ~40x.  REVERTED.
        #   highest (6-pass):       8.6e-8 product err, max 0.049 log-units
        #           posterior error.  This is the only acceptable setting.
        w = kinv @ kstar  # (n, m)  [package-wide highest precision]
        if full_cov:
            kqq = kernel_fn(params, xq, config=config.kernel, include_noise=True)
            cov = kqq - kstar.T @ w
            return mean, cov
        kdiag = kernel_diag(params, xq, config=config.kernel, include_noise=True)
        var = kdiag - jnp.sum(kstar * w, axis=0)
        return mean, jnp.maximum(var, 0.0)

    return jax.vmap(one)(state.params, state.kinv, state.alpha_vec)


def gp_sample(
    state: GPState,
    xq: jnp.ndarray,
    key: jax.Array,
    n_samples: int,
    *,
    config: GPConfig = GPConfig(),
) -> jnp.ndarray:
    """Draw joint posterior samples: returns (b, m, n_samples).

    Mirrors sklearn ``sample_y`` (multivariate normal over the query points
    for each GP independently).
    """
    mean, cov = gp_predict(state, xq, config=config, full_cov=True)

    def one(m, c, k):
        chol = cholesky_jittered(c)
        z = jax.random.normal(k, (c.shape[0], n_samples), dtype=m.dtype)
        return m[:, None] + chol @ z

    keys = jax.random.split(key, mean.shape[0])
    return jax.vmap(one)(mean, cov, keys)
