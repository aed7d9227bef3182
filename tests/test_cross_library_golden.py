"""Cross-library golden deltas -- ACTIVE only once the fixture is extended.

surmise/emcee/pocoMC cannot install in the build image (no pip, zero
egress), so `tests/fixtures/band_golden.npz` normally carries only
self-generated pins and every test here SKIPS.  Running
``python tools/make_golden_fixtures.py --capture-reference`` on an
unrestricted machine (see docs/SURMISE_PARITY.md "Closure status") appends
the real libraries' outputs to the fixture, and these tests then turn the
DERIVED parity rows into measured deltas with no further code changes.
"""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "band_golden.npz")


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(FIXTURE))


def _need(golden, key):
    if key not in golden:
        pytest.skip(
            f"fixture lacks {key}: run tools/make_golden_fixtures.py "
            "--capture-reference where surmise/emcee/pocomc install"
        )


@pytest.mark.parametrize("method", ["PCGP", "PCSK"])
def test_band_head_matches_surmise_predictions(golden, method, tmp_path):
    """Rebuilt head vs actual surmise 0.2.1 on the committed golden problem
    (docs/SURMISE_PARITY.md rows 2-8: derivation-level parity becomes a
    measured delta).  Tolerances are loose-ish on purpose: the two
    implementations share construction, not optimizer trajectories."""
    _need(golden, f"surmise_{method}_mean")
    from gpbayestools_hic_tpu.models import EmulatorBAND
    from gpbayestools_hic_tpu.utils.synthetic import (
        write_parameter_file,
        write_training_pickle,
    )

    design, base, err, xq = (
        golden["design"], golden["base"], golden["err"], golden["xq"]
    )
    parfile = write_parameter_file(
        str(tmp_path / "pars.txt"), design.shape[1]
    )
    pkl = write_training_pickle(str(tmp_path / "train.pkl"), design, base, err)
    emu = EmulatorBAND(pkl, parfile, method=method)
    emu.trainEmulatorAutoMask()
    mean, cov = emu.predict(xq)
    ref_mean = golden[f"surmise_{method}_mean"]
    ref_var = golden[f"surmise_{method}_var"]
    scale = np.abs(ref_mean).max()
    np.testing.assert_allclose(np.asarray(mean), ref_mean, atol=0.05 * scale)
    var = np.diagonal(np.asarray(cov), axis1=1, axis2=2)
    # predictive variances agree within a factor-2 band (optimizer-dependent)
    ratio = (var + 1e-12) / (ref_var + 1e-12)
    assert np.all(ratio < 4.0) and np.all(ratio > 0.25), (
        ratio.min(), ratio.max()
    )


def test_ensemble_moments_match_emcee(golden):
    """Our stretch move vs emcee's on the same analytic Gaussian: marginal
    moments within MC error, tau in the same class (exact chain equality is
    impossible across RNG streams by design)."""
    _need(golden, "emcee_gauss_mean")
    import jax
    import jax.numpy as jnp

    from gpbayestools_hic_tpu.samplers.ensemble import run_ensemble

    cov = np.array([[1.0, 0.6, 0.0], [0.6, 2.0, 0.3], [0.0, 0.3, 0.5]])
    prec = jnp.asarray(np.linalg.inv(cov))

    def log_prob(state, x):
        return -0.5 * jnp.einsum("bi,ij,bj->b", x, prec, x)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (64, 3)) * 0.1
    res = run_ensemble(log_prob, x0, 4000, jax.random.PRNGKey(1), state=())
    flat = np.asarray(res.chain)[:, 1000:, :].reshape(-1, 3)
    np.testing.assert_allclose(
        flat.mean(0), golden["emcee_gauss_mean"], atol=0.1
    )
    np.testing.assert_allclose(
        flat.std(0), golden["emcee_gauss_std"], rtol=0.1
    )


def test_smc_logz_matches_pocomc(golden, tmp_path):
    """Our persistent-sampling SMC evidence vs actual pocoMC on the same
    truncated Gaussian (both also near the analytic value)."""
    _need(golden, "pocomc_gauss_logz")
    import jax.numpy as jnp

    from gpbayestools_hic_tpu.samplers.smc import run_smc

    cov = np.array([[1.0, 0.6, 0.0], [0.6, 2.0, 0.3], [0.0, 0.3, 0.5]])
    prec = jnp.asarray(np.linalg.inv(cov))

    def log_like(state, x, finite):
        return -0.5 * jnp.einsum("bi,ij,bj->b", x, prec, x)

    out = run_smc(
        log_like, jnp.full(3, -5.0), jnp.full(3, 5.0),
        n_effective=600, n_active=300, n_prior=1200, n_total=4000,
        n_evidence=2000, seed=0,
    )
    logz_pm, logz_err_pm = golden["pocomc_gauss_logz"]
    tol = 3.0 * float(np.hypot(logz_err_pm, out["logz_err"])) + 0.05
    assert abs(float(out["logz"]) - float(logz_pm)) < tol, (
        out["logz"], logz_pm, tol
    )
