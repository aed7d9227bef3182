"""PTLMC sampler tests: Gaussian-target statistics and Chain integration."""

import pickle

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gpbayestools_hic_tpu.samplers.ptlmc import run_ptlmc, _temperature_ladder, _temp_exchange


def test_temperature_ladder_matches_reference_formula():
    temps = np.asarray(_temperature_ladder(30, 16, 100.0, jnp.float64))
    expected = np.concatenate([
        np.exp(np.linspace(np.log(100.0), np.log(100.0) / 31, 30)),
        np.ones(16),
    ])
    np.testing.assert_allclose(temps, expected, rtol=1e-12)
    assert np.isclose(temps[0], 100.0)
    assert np.all(np.diff(temps[:30]) < 0)


def test_temp_exchange_preserves_permutation():
    key = jax.random.PRNGKey(0)
    n = 12
    temps = jnp.linspace(10.0, 1.0, n)
    lpostf = jax.random.normal(key, (n,)) * 10
    order = _temp_exchange(key, jnp.arange(n), lpostf, temps, iters=5)
    assert sorted(np.asarray(order).tolist()) == list(range(n))


def test_ptlmc_gaussian_moments():
    """PTLMC must recover a correlated-Gaussian posterior's moments."""
    mean = jnp.asarray([0.5, -0.3])
    cov = jnp.asarray([[0.04, 0.018], [0.018, 0.09]])
    cov_inv = jnp.linalg.inv(cov)

    def log_post(state, x):
        d = x - mean
        return -0.5 * jnp.einsum("bi,ij,bj->b", d, cov_inv, d)

    def draw(n):
        rng = np.random.default_rng(0)
        return rng.uniform(-2, 2, size=(n, 2))

    chain = run_ptlmc(
        log_post,
        draw,
        numtemps=10,
        numchain=16,
        sampperchain=400,
        maxtemp=30.0,
        nstartparameters=500,
        key=jax.random.PRNGKey(1),
        state=(),
    )
    assert chain.shape == (16, 400, 2)
    samples = np.asarray(chain[:, 100:, :]).reshape(-1, 2)
    np.testing.assert_allclose(samples.mean(axis=0), mean, atol=0.05)
    np.testing.assert_allclose(
        np.cov(samples.T), cov, atol=0.03
    )


@pytest.mark.slow
def test_chain_run_ptlmc(tmp_path, rng, training_pickle_factory):
    """Chain.run_MCMC_PTLMC produces the reference chain-pickle contract and
    concentrates near the truth point."""
    from gpbayestools_hic_tpu.models import Emulator
    from gpbayestools_hic_tpu.samplers import Chain

    ndim, nev = 2, 30
    design = rng.uniform(0, 1, size=(nev, ndim))
    parfile = tmp_path / "pars.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(ndim)))
    freqs = rng.uniform(1, 2.5, size=(ndim, 5))
    base = 2.0 + np.sin(design @ freqs)
    pkl = training_pickle_factory(
        tmp_path / "t.pkl", design, base, 0.01 * np.abs(base)
    )
    emu = Emulator(str(pkl), str(parfile), npc=3)
    emu.trainEmulatorAutoMask()

    truth = np.array([0.4, 0.6])
    exp_mean = 2.0 + np.sin(truth @ freqs)
    exp_pkl = tmp_path / "exp.pkl"
    with open(exp_pkl, "wb") as f:
        pickle.dump(
            {"0": {"obs": np.stack([exp_mean, 0.05 * np.abs(exp_mean)])}}, f
        )
    chain = Chain(
        mcmc_path=str(tmp_path / "mcmc" / "chain.pkl"),
        expdata_path=str(exp_pkl),
        model_parafile=str(parfile),
    )
    chain.loadEmulator([emu])
    chain.run_MCMC_PTLMC(nsteps=200, nwalkers=8, ntemps=10, maxtemp=50,
                         nstartparameters=300)
    with open(chain.mcmc_path, "rb") as f:
        data = pickle.load(f)
    assert data["chain"].shape == (8, 200, 2)
    post = data["chain"][:, 50:, :].reshape(-1, 2)
    assert np.all(np.abs(post.mean(axis=0) - truth) < 0.2)


def test_ptlmc_gradient_mode_gaussian():
    """Langevin drift + MH correction (the reference's unusable gradient
    branch) recovers a Gaussian target."""
    mean = jnp.asarray([0.5, -0.3])
    cov = jnp.asarray([[0.04, 0.018], [0.018, 0.09]])
    cov_inv = jnp.linalg.inv(cov)

    def log_post(state, x):
        d = x - mean
        return -0.5 * jnp.einsum("bi,ij,bj->b", d, cov_inv, d)

    def draw(n):
        rng = np.random.default_rng(3)
        return rng.uniform(-2, 2, size=(n, 2))

    chain = run_ptlmc(
        log_post, draw,
        numtemps=8, numchain=16, sampperchain=400, maxtemp=30.0,
        nstartparameters=400, key=jax.random.PRNGKey(2), state=(),
        use_gradients=True,
    )
    samples = np.asarray(chain[:, 100:, :]).reshape(-1, 2)
    np.testing.assert_allclose(samples.mean(axis=0), mean, atol=0.05)
    np.testing.assert_allclose(np.cov(samples.T), cov, atol=0.035)


def test_ptlmc_gradient_mode_1d_gaussian():
    """ndim == 1 with gradients: the scan must receive the REAL proposal
    covariance (an identity placeholder made the Langevin MH correction
    inconsistent with the hc-scaled proposal and biased 1-D chains)."""
    mu, sd = 0.3, 0.15

    def log_post(state, x):
        return -0.5 * jnp.sum(((x - mu) / sd) ** 2, axis=-1)

    def draw(n):
        return np.random.default_rng(5).uniform(-2, 2, size=(n, 1))

    chain = run_ptlmc(
        log_post, draw,
        numtemps=8, numchain=16, sampperchain=400, maxtemp=30.0,
        nstartparameters=300, key=jax.random.PRNGKey(4), state=(),
        use_gradients=True,
    )
    samples = np.asarray(chain[:, 100:, 0]).reshape(-1)
    assert abs(samples.mean() - mu) < 0.03, samples.mean()
    assert abs(samples.std() - sd) < 0.04, samples.std()


def test_ptlmc_rejects_insufficient_start_points():
    def log_post(state, x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    with pytest.raises(ValueError, match="nstartparameters"):
        run_ptlmc(
            log_post, lambda n: np.zeros((n, 2)),
            numtemps=30, numchain=16, sampperchain=10, maxtemp=30.0,
            nstartparameters=40, key=jax.random.PRNGKey(0), state=(),
        )
