"""Distribution-level statistical tests and determinism guarantees."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import stats

from gpbayestools_hic_tpu.samplers import run_ensemble
from gpbayestools_hic_tpu.samplers.ptlmc import run_ptlmc
from gpbayestools_hic_tpu.utils.metrics import effective_sample_size


def test_ensemble_ks_against_analytic_gaussian():
    """Kolmogorov-Smirnov test of thinned ensemble samples against the exact
    target marginal (stronger than moment checks)."""
    mean, std = 0.7, 0.3

    def log_prob(x):
        return -0.5 * jnp.sum(((x - mean) / std) ** 2, axis=-1)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (64, 2)) * 0.1 + mean
    res = run_ensemble(log_prob, x0, 4000, jax.random.PRNGKey(1))
    chain = np.asarray(res.chain[:, 1000:, :])
    # thin by the integrated autocorrelation time for ~independent draws
    ess = effective_sample_size(chain)
    thin = max(int(chain.shape[0] * chain.shape[1] / ess), 1)
    samples = chain[:, ::thin, 0].reshape(-1)
    d, p = stats.kstest(samples, "norm", args=(mean, std))
    assert p > 1e-3, (d, p, len(samples))


def test_ensemble_deterministic_given_seed():
    def log_prob(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    x0 = jax.random.normal(jax.random.PRNGKey(3), (16, 3))
    r1 = run_ensemble(log_prob, x0, 50, jax.random.PRNGKey(7))
    r2 = run_ensemble(log_prob, x0, 50, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(r1.chain), np.asarray(r2.chain))


@pytest.mark.slow
def test_ptlmc_deterministic_given_seed():
    def log_post(state, x):
        return -0.5 * jnp.sum((x - 0.3) ** 2, axis=-1) / 0.01

    def draw(n):
        return np.random.default_rng(0).uniform(0, 1, size=(n, 2))

    kwargs = dict(numtemps=4, numchain=8, sampperchain=50, maxtemp=10.0,
                  nstartparameters=100, state=())
    c1 = run_ptlmc(log_post, draw, key=jax.random.PRNGKey(5), **kwargs)
    c2 = run_ptlmc(log_post, draw, key=jax.random.PRNGKey(5), **kwargs)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_ess_estimate_sane_on_iid_samples():
    """tau ~ 1 for iid draws -> ESS ~ sample count."""
    rng = np.random.default_rng(0)
    chain = rng.normal(size=(8, 500, 2))
    ess = effective_sample_size(chain)
    assert ess > 0.5 * 8 * 500, ess


def test_tau_convergence_flag():
    """The windowed tau estimator flags short-chain (biased-low) estimates:
    an AR(1) chain with tau ~ 200 measured over 256 steps is unreliable;
    iid samples over the same window are fine."""
    import warnings

    from gpbayestools_hic_tpu.utils.metrics import integrated_autocorr_time

    rng = np.random.default_rng(1)
    # AR(1): x_t = phi x_{t-1} + e; tau = (1+phi)/(1-phi) ~ 199
    phi, n = 0.99, 256
    x = np.empty((8, n))
    x[:, 0] = rng.normal(size=8)
    for t in range(1, n):
        x[:, t] = phi * x[:, t - 1] + np.sqrt(1 - phi**2) * rng.normal(size=8)
    tau, ok = integrated_autocorr_time(x, return_converged=True)
    assert not ok and tau > 5.0, (tau, ok)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        integrated_autocorr_time(x)
    assert any("lower bound" in str(x.message) for x in w)

    tau, ok = integrated_autocorr_time(
        rng.normal(size=(8, 256)), return_converged=True
    )
    assert ok and tau < 3.0, (tau, ok)


def test_ess_ignores_constant_parameter_dimension():
    """A pinned (constant) parameter dimension must not collapse the
    whole-chain ESS to zero or flag a healthy run unconverged (round-4
    review finding): its tau is reported as NaN and excluded from the
    aggregation; a chain where NOTHING varies keeps the stuck signal."""
    import warnings

    from gpbayestools_hic_tpu.utils.metrics import (
        convergence_diagnostics,
        effective_sample_size,
    )

    rng = np.random.default_rng(0)
    healthy = rng.normal(size=(8, 400, 3))
    healthy[:, :, 2] = 0.77  # pinned dimension
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # no stuck warning
        ess = effective_sample_size(healthy)
    assert ess > 100, ess
    rep = convergence_diagnostics(healthy)
    assert np.isnan(rep["tau"][2]) and np.isfinite(rep["tau"][:2]).all()
    assert rep["ess"] > 100 and rep["converged"]

    stuck = np.full((4, 100, 2), 1.23)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        assert effective_sample_size(stuck) == 0.0
