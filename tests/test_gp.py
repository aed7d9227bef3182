"""Parity tests for the batched exact GP vs sklearn GaussianProcessRegressor."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from sklearn.gaussian_process import GaussianProcessRegressor as GPR
from sklearn.gaussian_process import kernels as skk

from gpbayestools_hic_tpu.models.gp import (
    GPConfig,
    gp_fit,
    gp_nll,
    gp_predict,
    gp_sample,
)
from gpbayestools_hic_tpu.ops.kernels import KernelConfig


def _sk_kernel(ls, kind="RBF", amp=1.0, noise=0.05, ls_bounds=None):
    ls_bounds = ls_bounds if ls_bounds is not None else "fixed"
    if kind == "RBF":
        base = skk.RBF(length_scale=ls, length_scale_bounds=ls_bounds)
    else:
        base = skk.Matern(length_scale=ls, length_scale_bounds=ls_bounds, nu=1.5)
    return skk.ConstantKernel(amp) * base + skk.WhiteKernel(noise)


def _toy_data(rng, n=40, d=3):
    x = rng.uniform(0, 1, size=(n, d))
    y = (
        np.sin(3 * x[:, 0])
        + 0.5 * np.cos(5 * x[:, 1]) * x[:, 2]
        + 0.05 * rng.normal(size=n)
    )
    return x, y


def test_gp_nll_matches_sklearn_lml(rng):
    """LML at fixed hyperparameters must match sklearn exactly."""
    x, y = _toy_data(rng)
    ls = np.array([0.7, 1.3, 0.9])
    amp, noise = 1.4, 0.07
    gpr = GPR(kernel=_sk_kernel(ls, amp=amp, noise=noise), alpha=0.1,
              optimizer=None).fit(x, y)
    sk_lml = gpr.log_marginal_likelihood_value_
    params = {
        "log_amp": jnp.log(amp),
        "log_ls": jnp.log(jnp.asarray(ls)),
        "log_noise": jnp.log(noise),
    }
    ours = -gp_nll(params, jnp.asarray(x), jnp.asarray(y), GPConfig())
    np.testing.assert_allclose(float(ours), sk_lml, rtol=1e-8)


@pytest.mark.parametrize("kind", ["RBF", "Matern"])
def test_gp_predict_matches_sklearn_fixed_hyperparams(rng, kind):
    """Posterior mean/cov at fixed hyperparameters must match sklearn."""
    x, y = _toy_data(rng)
    xq = rng.uniform(0, 1, size=(7, 3))
    ls = np.array([0.8, 1.1, 0.6])
    gpr = GPR(kernel=_sk_kernel(ls, kind=kind), alpha=0.1, optimizer=None).fit(x, y)
    sk_mean, sk_cov = gpr.predict(xq, return_cov=True)

    config = GPConfig(kernel=KernelConfig(kind))
    # Build state via gp_fit with zero optimizer iterations from the exact
    # hyperparameters: use maxiter=0 so the initial point is kept.
    state = gp_fit(
        jnp.asarray(x), jnp.asarray(y)[None, :], jnp.asarray(ls),
        config=config, maxiter=0,
    )
    # gp_fit initializes amp=1, noise=0.05, ls=ptp -> matches _sk_kernel defaults
    mean, var = gp_predict(state, jnp.asarray(xq), config=config)
    np.testing.assert_allclose(mean[0], sk_mean, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(var[0], np.diag(sk_cov), rtol=1e-5, atol=1e-8)
    mean2, cov = gp_predict(state, jnp.asarray(xq), config=config, full_cov=True)
    np.testing.assert_allclose(cov[0], sk_cov, rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_gp_fit_reaches_sklearn_quality(rng):
    """Optimized LML must be at least as good as sklearn's (same bounds)."""
    x, y = _toy_data(rng, n=50)
    ptp = np.ones(3)
    kernel = skk.ConstantKernel(1.0) * skk.RBF(
        length_scale=ptp, length_scale_bounds=np.outer(ptp, (1e-1, 1e2))
    ) + skk.WhiteKernel(0.05, noise_level_bounds=(1e-2, 1e2))
    gpr = GPR(kernel=kernel, alpha=0.1).fit(x, y)
    sk_lml = gpr.log_marginal_likelihood_value_

    state = gp_fit(jnp.asarray(x), jnp.asarray(y)[None, :], jnp.asarray(ptp),
                   config=GPConfig(), nrestarts=2, key=jax.random.PRNGKey(1))
    assert float(state.lml[0]) >= sk_lml - 0.2, (float(state.lml[0]), sk_lml)


@pytest.mark.slow
def test_gp_fit_predictions_match_sklearn_after_opt(rng):
    """After independent optimization, predictions should agree closely."""
    x, y = _toy_data(rng, n=60)
    xq = rng.uniform(0, 1, size=(10, 3))
    ptp = np.ones(3)
    kernel = skk.ConstantKernel(1.0) * skk.RBF(
        length_scale=ptp, length_scale_bounds=np.outer(ptp, (1e-1, 1e2))
    ) + skk.WhiteKernel(0.05, noise_level_bounds=(1e-2, 1e2))
    gpr = GPR(kernel=kernel, alpha=0.1).fit(x, y)
    sk_mean = gpr.predict(xq)

    state = gp_fit(jnp.asarray(x), jnp.asarray(y)[None, :], jnp.asarray(ptp),
                   config=GPConfig(), nrestarts=2, key=jax.random.PRNGKey(0))
    mean, var = gp_predict(state, jnp.asarray(xq), config=GPConfig())
    scale = np.std(y)
    np.testing.assert_allclose(mean[0], sk_mean, atol=0.05 * scale)


@pytest.mark.slow
def test_gp_fit_batched_over_pcs(rng):
    """Batch of 3 GPs fits in one call; each matches its own scalar fit."""
    x, _ = _toy_data(rng, n=30)
    ys = np.stack([
        np.sin(4 * x[:, 0]),
        np.cos(2 * x[:, 1]),
        x[:, 2] ** 2,
    ])
    ptp = jnp.ones(3)
    state = gp_fit(jnp.asarray(x), jnp.asarray(ys), ptp, config=GPConfig())
    assert state.lml.shape == (3,)
    for i in range(3):
        solo = gp_fit(jnp.asarray(x), jnp.asarray(ys[i])[None], ptp,
                      config=GPConfig())
        # batched and solo runs reassociate floating point differently, and
        # the ftol improvement stop (ops/lbfgsb.py) can therefore fire one
        # iteration apart on the two paths -- the optima agree to optimizer
        # tolerance, not bitwise (observed delta ~4e-6 relative)
        np.testing.assert_allclose(state.lml[i], solo.lml[0], rtol=1e-4)


@pytest.mark.slow
def test_gp_sample_moments(rng):
    x, y = _toy_data(rng)
    xq = rng.uniform(0, 1, size=(5, 3))
    state = gp_fit(jnp.asarray(x), jnp.asarray(y)[None, :], jnp.ones(3),
                   config=GPConfig())
    samples = gp_sample(state, jnp.asarray(xq), jax.random.PRNGKey(0), 4000)
    assert samples.shape == (1, 5, 4000)
    mean, var = gp_predict(state, jnp.asarray(xq), config=GPConfig())
    np.testing.assert_allclose(samples[0].mean(axis=1), mean[0], atol=0.05)
    np.testing.assert_allclose(samples[0].var(axis=1), var[0], rtol=0.2, atol=0.01)


def test_gp_predict_fast_grad_parity(rng):
    """fast_grad=True (custom-VJP quadratic form) must give identical
    values AND identical reverse-mode gradients to the vanilla path --
    it only restructures the backward matmul (gp._norm_mean_var)."""
    x, y = _toy_data(rng)
    state = gp_fit(jnp.asarray(x), jnp.asarray(y)[None, :], jnp.ones(3),
                   config=GPConfig(), maxiter=20)
    xq = jnp.asarray(rng.uniform(0.1, 0.9, size=(7, 3)))

    m0, v0 = gp_predict(state, xq, config=GPConfig())
    m1, v1 = gp_predict(state, xq, config=GPConfig(), fast_grad=True)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-10)

    def scalar(fast):
        def f(q):
            m, v = gp_predict(state, q, config=GPConfig(), fast_grad=fast)
            return jnp.sum(jnp.sin(m)) + jnp.sum(jnp.log1p(v))
        return f

    g0 = jax.grad(scalar(False))(xq)
    g1 = jax.grad(scalar(True))(xq)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-9,
                               atol=1e-12)

    # state-side cotangents are exact too (alpha_vec/linv enter the VJP)
    def wrt_state(fast):
        def f(alpha):
            st = state._replace(alpha_vec=alpha)
            m, v = gp_predict(st, xq, config=GPConfig(), fast_grad=fast)
            return jnp.sum(m * v)
        return f

    ga0 = jax.grad(wrt_state(False))(state.alpha_vec)
    ga1 = jax.grad(wrt_state(True))(state.alpha_vec)
    np.testing.assert_allclose(np.asarray(ga1), np.asarray(ga0), rtol=1e-9,
                               atol=1e-12)

    def wrt_linv(fast):
        def f(linv):
            st = state._replace(linv=linv)
            m, v = gp_predict(st, xq, config=GPConfig(), fast_grad=fast)
            return jnp.sum(m * v)
        return f

    gl0 = jax.grad(wrt_linv(False))(state.linv)
    gl1 = jax.grad(wrt_linv(True))(state.linv)
    np.testing.assert_allclose(np.asarray(gl1), np.asarray(gl0), rtol=1e-9,
                               atol=1e-12)


def test_gp_fit_ls_growth_variants_reach_same_optimum(rng):
    """The line-search warm-start growth factor changes the search path,
    not the converged optimum: LMLs must agree to optimizer tolerance."""
    x, y = _toy_data(rng, n=50)
    ptp = np.ones(3)
    lmls = []
    for growth in (2.0, 1.25):
        state = gp_fit(
            jnp.asarray(x), jnp.asarray(y)[None, :], jnp.asarray(ptp),
            config=GPConfig(), key=jax.random.PRNGKey(1), ls_growth=growth,
        )
        lmls.append(float(state.lml[0]))
    np.testing.assert_allclose(lmls[0], lmls[1], rtol=0, atol=1e-5)
