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
    """Static GP configuration (hashable, safe as a jit static arg).

    ``var_precision`` sets the TPU matmul precision of the predictive-
    variance product ``G @ k_*`` (see :class:`GPState`): "default" (1-pass
    bf16), "high" (3-pass), or "highest" (6-pass).  Because the quadratic
    form is a *norm* ``|G k_*|^2``, a norm-wise relative error eps in the
    product perturbs the quadratic form by only ~2 eps -- no internal
    cancellation -- so "high" passes the 0.5-log-unit posterior validation
    (tools/tpu_validation.py) while running the dominant matmul in half the
    passes of "highest" (the explicit-K^-1 formulation needed "highest":
    its product error was amplified ~40x by cancellation inside
    ``k_*^T K^-1 k_*``).  Ignored on CPU (always full precision).

    Measured ladder on the flagship posterior (v5e,
    tools/var_precision_experiment.py; max |lp32 - lp64| over 64 points /
    posterior evals/s, value only):

    - "highest": 0.056 log-units, 132k evals/s;
    - "high":    0.292 log-units, 160k evals/s  <- validated default;
    - "default": 68.3 log-units -- REJECTED.  The norm form fixed the
      cancellation *inside* q, but the final variance ``kdiag - q`` still
      subtracts two nearly-equal numbers wherever the GP is confident
      (q -> kdiag), so bf16's ~2e-3 product error explodes the small
      variance by orders of magnitude.  Do not re-attempt bf16 here
      without reformulating that subtraction away.
    """

    kernel: KernelConfig = KernelConfig("RBF")
    alpha: float = 0.1  # fixed diagonal regularization (sklearn GPR alpha)
    var_precision: str = "high"
    #: matmul precision of the REVERSE pass through the fast-gradient
    #: predict (the sampling likelihood's HMC/Langevin gradients):
    #: "default" (1-pass bf16, production) or "high"/"highest".  Unlike
    #: ``var_precision`` this does NOT touch posterior VALUES -- only the
    #: gradient that shapes the leapfrog/Langevin proposal map.  Any
    #: deterministic force field keeps leapfrog reversible and
    #: volume-preserving, and the accept step uses the full-precision
    #: value, so the chain stays exactly invariant; cheap gradients trade
    #: a little acceptance rate for ~2.2x fewer backward MXU passes
    #: (measured: see ops/pallas_predict.fused_pc_predict_fastbwd).
    #: Ignored on CPU and by jacfwd consumers (sensitivity analysis uses
    #: the vanilla full-precision path).
    grad_precision: str = "default"
    #: > 0 switches hyperparameter fitting from MLE to MAP: an isotropic
    #: Gaussian penalty of this precision in log-hyperparameter space,
    #: centered on the reference initialization (lengthscales = ptp,
    #: amp 1, noise 0.05).  Plays the stabilizing role of surmise's
    #: lengthscale hyperprior (docs/SURMISE_PARITY.md item 6); surmise's
    #: exact hyperprior constants are not reproducible without the library,
    #: so the strength is an explicit measurable knob.
    map_prior_strength: float = 0.0


class GPState(NamedTuple):
    """Trained state for a batch of GPs sharing the same inputs.

    Leading axis of every field is the GP/batch axis (``npc``).

    ``linv`` (the explicit inverse Cholesky factor G = L^-1, lower
    triangular, K^-1 = G^T G) is precomputed at fit time so the predictive
    variance is one MXU matmul ``v = G k_*`` plus a column-norm reduction
    ``|v|^2`` -- instead of a sequential triangular solve, which on TPU is
    ~50x slower than the matmul at flagship scale (n=1000, m=128).  The
    factored form keeps the quadratic form non-negative by construction
    and cancellation-free, which is what lets the matmul run at 3-pass
    ("high") precision (see :class:`GPConfig`).  K carries the alpha=0.1 +
    white-noise diagonal, so the factor is well-conditioned even in f32.
    """

    params: dict          # {"log_amp": (b,), "log_ls": (b, d), "log_noise": (b,)}
    x: jnp.ndarray        # (n, d) shared training inputs
    y: jnp.ndarray        # (b, n) training targets
    chol: jnp.ndarray     # (b, n, n) Cholesky of K
    alpha_vec: jnp.ndarray  # (b, n) K^-1 y
    linv: jnp.ndarray     # (b, n, n) explicit L^-1 (K^-1 = linv^T linv)
    lml: jnp.ndarray      # (b,) log marginal likelihood at the optimum


_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _var_precision(config: GPConfig):
    return _PRECISIONS[config.var_precision]


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


@partial(
    jax.jit, static_argnames=("config", "nrestarts", "maxiter", "ls_growth")
)
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
    ls_growth: float = 2.0,
) -> GPState:
    """Fit ``npc`` independent GPs on shared inputs, all in one device program.

    ``x`` (n, d), ``y_batch`` (npc, n).  ``ptp`` (d,) sets the reference
    initialization (length scales = parameter ranges) and bounds.  With
    ``nrestarts > 0``, each GP additionally starts from ``nrestarts`` points
    sampled uniformly in the log-bound box and the best optimum wins
    (sklearn ``n_restarts_optimizer`` semantics).  ``noise_diag`` (npc, n)
    adds known per-point noise variances to each GP's Gram diagonal
    (stochastic kriging / PCSK).  ``ls_growth`` is the L-BFGS line-search
    warm-start growth factor (see :func:`..ops.lbfgsb.lbfgsb_minimize`);
    every trial costs an O(n^3) Cholesky, so the trial count IS the fit
    wall clock.
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
            nll = gp_nll(_unpack(vec, d), x, y, config, nd)
            if config.map_prior_strength > 0.0:
                # MAP objective (see GPConfig.map_prior_strength)
                nll = nll + 0.5 * config.map_prior_strength * jnp.sum(
                    (vec - theta0) ** 2
                )
            return nll

        res = lbfgsb_minimize(
            nll_vec, t0, lower, upper, maxiter=maxiter, ls_growth=ls_growth
        )
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
    """Build the trained-state arrays (Cholesky, K^-1 y, explicit L^-1, LML)
    for a batch of GPs with known hyperparameters.

    Shared by :func:`gp_fit` and the reference-emulator importer
    (models/migrate.py), so the jitter-rescue and MXU-friendly L^-1
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
    linvs = jax.vmap(
        lambda c: jax.lax.linalg.triangular_solve(
            c, eye, left_side=True, lower=True
        )
    )(chols)
    lml = (
        -0.5 * jnp.sum(whitened * whitened, axis=1)
        - jnp.sum(jnp.log(jnp.diagonal(chols, axis1=-2, axis2=-1)), axis=1)
        - 0.5 * n * jnp.log(2.0 * jnp.pi)
    )
    return GPState(
        params=params, x=x, y=y_batch, chol=chols, alpha_vec=alpha_vecs,
        linv=linvs, lml=lml,
    )


def _chol_and_white(p, x, y, config, noise_diag=None):
    k = _build_k(p, x, config, noise_diag)
    chol = cholesky_jittered(k)
    w = solve_lower_triangular(chol, y)
    return chol, w


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _norm_mean_var(precs, kstar, linv, alpha_vec):
    """(kstar^T alpha, |linv kstar|^2 per column) with a hand-written VJP.

    The quadratic form ``q = k_*^T K^-1 k_*`` is computed in factored form
    ``q = |v|^2, v = G k_*`` (G = L^-1): non-negative by construction and
    free of the internal cancellation that made the explicit-K^-1 product
    precision-critical, so ``prec`` can be 3-pass "high" (see GPConfig).

    The hand-written VJP keeps the reverse pass at ONE extra matmul
    (``G^T (v ct_q)``) instead of plain AD's two (it reuses the forward's
    ``v``), and the state-side cotangents (ct_linv) are dead-code-eliminated
    by XLA when the caller differentiates only w.r.t. the query points --
    the sampling case.  Forward-mode (jacfwd) callers must use the vanilla
    path -- custom_vjp functions cannot be forward-differentiated (see
    gp_predict's ``fast_grad`` flag).

    ``precs`` is the pair ``(value_precision, grad_precision)``: the
    forward matmul (which sets posterior VALUES) runs at the first, the
    reverse-pass matmul at the second -- GPConfig.grad_precision's
    "default" (1-pass bf16) is legal there because gradient precision only
    shapes the sampler's proposal map (see GPConfig).
    """
    prec, _ = precs
    v = jnp.matmul(linv, kstar, precision=prec)
    return kstar.T @ alpha_vec, jnp.sum(v * v, axis=0)


def _norm_fwd(precs, kstar, linv, alpha_vec):
    prec, _ = precs
    v = jnp.matmul(linv, kstar, precision=prec)
    out = (kstar.T @ alpha_vec, jnp.sum(v * v, axis=0))
    return out, (v, alpha_vec, linv, kstar)


def _norm_bwd(precs, res, cts):
    _, bwd_prec = precs
    v, alpha_vec, linv, kstar = res
    ct_mean, ct_q = cts
    vq = v * ct_q[None, :]
    ct_kstar = alpha_vec[:, None] * ct_mean[None, :] + 2.0 * jnp.matmul(
        linv.T, vq, precision=bwd_prec
    )
    # exact cotangents toward the state arrays too (DCE'd when the caller
    # differentiates only w.r.t. the query points -- the sampling case)
    ct_linv = 2.0 * (vq @ kstar.T)
    ct_alpha = kstar @ ct_mean
    return ct_kstar, ct_linv, ct_alpha


_norm_mean_var.defvjp(_norm_fwd, _norm_bwd)


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
    through :func:`_norm_mean_var`, whose hand-written VJP reuses the
    forward's ``G k_*`` product so a reverse-mode gradient costs one extra
    matmul instead of plain AD's two.  Identical values and reverse
    gradients; NOT forward-differentiable (jacfwd callers use the default
    path).
    """

    prec = _var_precision(config)

    def one(params, linv, alpha_vec):
        kstar = kernel_fn(
            params, state.x, xq, config=config.kernel, include_noise=False
        )  # (n, m)
        if fast_grad and not full_cov:
            mean, q = _norm_mean_var(
                (prec, _PRECISIONS[config.grad_precision]),
                kstar, linv, alpha_vec,
            )
            kdiag = kernel_diag(params, xq, config=config.kernel, include_noise=True)
            return mean, jnp.maximum(kdiag - q, 0.0)
        mean = kstar.T @ alpha_vec
        # G k_* as a matmul (MXU) rather than a sequential triangular solve;
        # see GPState.linv.  This is ~99% of the posterior-eval FLOPs
        # (36 x (1000,1000)@(1000,512) per flagship walker batch), so its
        # matmul precision IS the eval throughput.  Measured ladder on TPU
        # v5e for the OLD explicit-K^-1 form (product err vs f64, posterior
        # err via tools/tpu_validation): default 2.4e-3 -> corrupted; high
        # 1.3e-5 -> 2.21 log-units (the kdiag - k^T K^-1 k cancellation
        # amplified it ~40x, REJECTED); highest 8.6e-8 -> 0.049 log-units.
        # The factored norm form removes that amplification, so "high"
        # (GPConfig.var_precision, the default) is validated acceptable and
        # halves the matmul passes -- see GPConfig docstring.
        if full_cov:
            # full covariance (gp_sample / sample_y, not a hot path) stays
            # at full precision: the off-diagonal subtraction kqq - V^T V
            # is NOT the validated norm form, and var_precision's carve-out
            # covers variance-only products (see GPConfig/CLAUDE.md)
            full = _PRECISIONS["highest"]
            v = jnp.matmul(linv, kstar, precision=full)
            kqq = kernel_fn(params, xq, config=config.kernel, include_noise=True)
            cov = kqq - jnp.matmul(v.T, v, precision=full)
            return mean, cov
        v = jnp.matmul(linv, kstar, precision=prec)  # (n, m)
        kdiag = kernel_diag(params, xq, config=config.kernel, include_noise=True)
        var = kdiag - jnp.sum(v * v, axis=0)
        return mean, jnp.maximum(var, 0.0)

    return jax.vmap(one)(state.params, state.linv, state.alpha_vec)


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
