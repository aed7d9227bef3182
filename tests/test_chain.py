"""Chain + ensemble sampler tests: statistics, parity, contracts, resume."""

import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpbayestools_hic_tpu.samplers import Chain, run_ensemble


def test_ensemble_gaussian_moments():
    """Stretch move must reproduce a known Gaussian target's moments."""
    mean = jnp.asarray([1.0, -2.0])
    std = jnp.asarray([0.5, 2.0])

    def log_prob(x):
        return -0.5 * jnp.sum(((x - mean) / std) ** 2, axis=-1)

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (64, 2)) * 0.1
    res = run_ensemble(log_prob, x0, 3000, jax.random.PRNGKey(1))
    samples = np.asarray(res.chain[:, 500:, :]).reshape(-1, 2)
    np.testing.assert_allclose(samples.mean(axis=0), mean, atol=0.1)
    np.testing.assert_allclose(samples.std(axis=0), std, rtol=0.1)
    acc = np.asarray(res.acceptance)
    assert 0.1 < acc.mean() < 0.9


def test_ensemble_detailed_shapes():
    def log_prob(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (10, 3))
    res = run_ensemble(log_prob, x0, 20, jax.random.PRNGKey(1))
    assert res.chain.shape == (10, 20, 3)
    assert res.log_prob.shape == (10, 20)
    assert res.final_state.shape == (10, 3)


@pytest.fixture
def chain_setup(tmp_path, rng, training_pickle_factory):
    """Toy calibration problem: 2 emulators over disjoint observable blocks,
    synthetic experimental data taken from a known truth point."""
    from gpbayestools_hic_tpu.models import Emulator

    ndim, nev = 3, 35
    design = rng.uniform(0, 1, size=(nev, ndim))
    parfile = tmp_path / "pars.txt"
    parfile.write_text("".join(f"p{i}: $p_{i}$, 0.0, 1.0\n" for i in range(ndim)))

    emus, blocks = [], []
    for b, nobs in enumerate([4, 3]):
        freqs = rng.uniform(1, 2.5, size=(ndim, nobs))
        base = 2.0 + np.sin(design @ freqs) + (design**2) @ freqs * 0.2
        err = 0.01 * np.abs(base)
        pkl = training_pickle_factory(tmp_path / f"train{b}.pkl", design, base, err)
        emu = Emulator(str(pkl), str(parfile), npc=3)
        emu.trainEmulatorAutoMask()
        emus.append(emu)
        blocks.append((freqs, base))

    truth = np.array([0.4, 0.6, 0.5])
    exp_obs = []
    for freqs, _ in blocks:
        val = 2.0 + np.sin(truth @ freqs) + (truth**2) @ freqs * 0.2
        exp_obs.append(val)
    exp_mean = np.concatenate(exp_obs)
    exp_err = 0.05 * np.abs(exp_mean)
    exp_pkl = tmp_path / "exp.pkl"
    with open(exp_pkl, "wb") as f:
        pickle.dump(
            {"0": {"obs": np.stack([exp_mean, exp_err], axis=0)}}, f
        )

    chain = Chain(
        mcmc_path=str(tmp_path / "mcmc" / "chain.pkl"),
        expdata_path=str(exp_pkl),
        model_parafile=str(parfile),
    )
    chain.loadEmulator(emus)
    return chain, truth, tmp_path


def test_chain_log_posterior_matches_manual(chain_setup, rng):
    """Fused posterior == hand assembly: emulator predict + diagonal exp cov
    + scipy Cholesky loglike + the reference's constant extra_std term."""
    from scipy import linalg as sla

    chain, truth, _ = chain_setup
    X = rng.uniform(0.2, 0.8, size=(6, 3))
    got = chain.log_posterior(X)

    mean, cov = chain._predict(X)
    expected = np.empty(6)
    for i in range(6):
        c = cov[i] + chain.expdata_cov
        y = mean[i] - chain.expdata.flatten()
        L = np.linalg.cholesky(c)
        alpha = sla.cho_solve((L, True), y)
        expected[i] = -0.5 * y @ alpha - np.log(np.diag(L)).sum() + 2 * np.log(1e-16)
    np.testing.assert_allclose(got, expected, rtol=1e-8)


def test_chain_predict_extra_std_passthrough(chain_setup, rng):
    """_predict(X, extra_std=s) must follow the reference semantics
    (src/mcmc.py:153-166): the scalar is scaled by each sample's LAST
    parameter column and enters every emulator's predictive covariance."""
    chain, _, _ = chain_setup
    X = rng.uniform(0.2, 0.8, size=(5, 3))
    s = 0.3
    mean, cov = chain._predict(X, extra_std=s)
    mean0, cov0 = chain._predict(X)
    np.testing.assert_allclose(mean, mean0, rtol=1e-12)
    assert not np.allclose(cov, cov0)  # nonzero extra_std must change cov

    extra_arr = s * X[:, -1]
    i0 = 0
    for e in chain.emuList:
        m_i, c_i = e.predict(X, return_cov=True, extra_std=extra_arr)
        i1 = i0 + e.nobs
        np.testing.assert_allclose(mean[:, i0:i1], m_i, rtol=1e-6)
        np.testing.assert_allclose(cov[:, i0:i1, i0:i1], c_i, rtol=1e-6,
                                   atol=1e-10)
        i0 = i1

    # per-sample ARRAY extra_std is accepted (the reference's own
    # log_likelihood passes a length-m zeros array, src/mcmc.py:205-207)
    mean_a, cov_a = chain._predict(X, extra_std=np.full(X.shape[0], s))
    np.testing.assert_allclose(cov_a, cov, rtol=1e-10)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="extra_std"):
        chain._predict(X, extra_std=np.zeros(X.shape[0] + 1))


@pytest.mark.slow
def test_chain_run_mcmc_default_status_logs(chain_setup, caplog):
    """status=None defaults to ~10% acceptance logging, as the reference's
    LoggingEnsembleSampler does (src/mcmc.py:77-78)."""
    import logging

    chain, _, _ = chain_setup
    with caplog.at_level(logging.INFO, logger="gpbayestools_hic_tpu.samplers.chain"):
        chain.run_mcmc(nsteps=40, nburnsteps=20, nwalkers=8, nthin=4)
    step_logs = [r for r in caplog.records if r.message.startswith("step ")]
    # production logs at 4, 8, ..., 40 -> ~10 entries (burn-in adds its own)
    assert len(step_logs) >= 10


def test_chain_outside_box(chain_setup):
    chain, _, _ = chain_setup
    X = np.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [-0.1, 0.5, 0.5]])
    lp = chain.log_posterior(X)
    assert np.isfinite(lp[0])
    assert lp[1] == -np.inf and lp[2] == -np.inf
    ll = chain.log_likelihood(X, finite=True)
    assert ll[1] == -1e300 and ll[2] == -1e300
    prior = chain.log_prior(X)
    np.testing.assert_allclose(prior[0], 0.0)  # unit box volume -> log 1
    assert prior[1] == -np.inf


@pytest.mark.slow
def test_chain_run_mcmc_and_resume(chain_setup):
    """Posterior concentrates near truth; resume appends to the pickle."""
    chain, truth, tmp_path = chain_setup
    chain.run_mcmc(nsteps=300, nburnsteps=300, nwalkers=32, nthin=2, seed=0)
    with open(chain.mcmc_path, "rb") as f:
        data = pickle.load(f)
    assert data["chain"].shape == (32, 150, 3)

    post = data["chain"][:, 50:, :].reshape(-1, 3)
    assert np.all(np.abs(post.mean(axis=0) - truth) < 0.15), (
        post.mean(axis=0), truth,
    )

    # resume: skips burn-in, appends thinned production
    chain.run_mcmc(nsteps=100, nburnsteps=300, nwalkers=32, nthin=2, seed=1)
    with open(chain.mcmc_path, "rb") as f:
        data2 = pickle.load(f)
    assert data2["chain"].shape == (32, 200, 3)

    # the one-call convergence report runs on the stored chain
    rep = chain.convergence_report()
    assert rep["rhat"].shape == (3,) and rep["ess"] > 0
    # a fresh Chain object loads the pickle lazily before diagnosing
    chain.chain = False
    rep2 = chain.convergence_report()
    np.testing.assert_allclose(rep2["rhat"], rep["rhat"])


@pytest.mark.slow
def test_chain_rescoring(chain_setup, tmp_path):
    chain, _, base = chain_setup
    chain.run_mcmc(nsteps=50, nburnsteps=60, nwalkers=16, nthin=5, seed=0)
    out = base / "ll.pkl"
    ll = chain.compute_log_likelihood_for_chain(output_path=str(out))
    assert ll.shape == (16, 10)
    with open(out, "rb") as f:
        saved = pickle.load(f)
    np.testing.assert_allclose(saved["log_likelihood"], ll)
    # rescored likelihood equals direct evaluation
    direct = chain.log_likelihood(chain.chain.reshape(-1, 3)).reshape(16, 10)
    np.testing.assert_allclose(ll, direct, rtol=1e-10)


def _rebuild_with_mode(chain, mode):
    # assigning the mode invalidates the compiled programs by itself
    # (likelihood_mode is a cache-clearing property since round 4)
    chain.likelihood_mode = mode
    return chain


def test_likelihood_mode_generic_matches_auto(chain_setup, rng):
    """'generic' (per-block dense Cholesky via mvn_loglike_best) must equal
    'auto' (Woodbury fast path) exactly -- same math, different factorization
    (reference kernel: src/mcmc.py:23-65)."""
    chain, _, _ = chain_setup
    X = rng.uniform(0.2, 0.8, size=(8, 3))
    lp_auto = chain.log_posterior(X)
    lp_generic = _rebuild_with_mode(chain, "generic").log_posterior(X)
    np.testing.assert_allclose(lp_generic, lp_auto, rtol=1e-8)


def test_likelihood_mode_stitched_matches_auto(chain_setup, rng):
    """'stitched' (full (nobs, nobs) covariance Cholesky, the reference's
    src/mcmc.py:214 shape) must equal the block-factorized path when the
    experimental covariance is diagonal (off-diagonals zero)."""
    chain, _, _ = chain_setup
    X = rng.uniform(0.2, 0.8, size=(8, 3))
    lp_auto = chain.log_posterior(X)
    lp_stitched = _rebuild_with_mode(chain, "stitched").log_posterior(X)
    np.testing.assert_allclose(lp_stitched, lp_auto, rtol=1e-8)


def test_dense_expdata_cov_matches_manual(chain_setup, rng):
    """A DENSE experimental covariance (off-diagonal correlations) must take
    the stitched path automatically and match a hand-built scipy Cholesky
    likelihood (reference accepts dense blocks at src/mcmc.py:214)."""
    from scipy import linalg as sla

    chain, _, _ = chain_setup
    nobs = chain.nobs
    # correlate neighboring observables ACROSS the emulator-block boundary
    dense = np.array(chain.expdata_cov, dtype=np.float64)
    sd = np.sqrt(np.diag(dense))
    for i in range(nobs - 1):
        c = 0.3 * sd[i] * sd[i + 1]
        dense[i, i + 1] = dense[i + 1, i] = c
    np.linalg.cholesky(dense)  # stays PD
    chain.expdata_cov = dense
    chain._device_fns = None

    X = rng.uniform(0.2, 0.8, size=(5, 3))
    got = chain.log_posterior(X)
    mean, cov = chain._predict(X)
    expected = np.empty(5)
    for i in range(5):
        c = cov[i] + dense
        y = mean[i] - chain.expdata.flatten()
        L = np.linalg.cholesky(c)
        alpha = sla.cho_solve((L, True), y)
        expected[i] = -0.5 * y @ alpha - np.log(np.diag(L)).sum() + 2 * np.log(1e-16)
    np.testing.assert_allclose(got, expected, rtol=1e-8)
    # and it must DIFFER from the diagonal-covariance posterior
    chain.expdata_cov = np.diag(np.diag(dense))
    chain._device_fns = None
    lp_diag = chain.log_posterior(X)
    assert np.max(np.abs(lp_diag - got)) > 1e-3


def test_unknown_likelihood_mode_raises(chain_setup):
    """The property setter rejects a bad mode at ASSIGNMENT (it used to be
    caught only when the device programs were next rebuilt, which silently
    skipped validation if they were already cached)."""
    chain, _, _ = chain_setup
    with pytest.raises(ValueError, match="likelihood_mode"):
        chain.likelihood_mode = "banana"


def test_likelihood_mode_change_invalidates_compiled_programs(chain_setup, rng):
    """Assigning likelihood_mode after a posterior evaluation must take
    effect (round-4 review: the cached device programs made a later
    assignment silently inert)."""
    chain, _, _ = chain_setup
    X = rng.uniform(0.2, 0.8, size=(4, 3))
    chain.log_posterior(X)           # builds + caches the 'auto' programs
    fns_auto = chain._device_fns
    chain.likelihood_mode = "generic"
    assert chain._device_fns is None  # invalidated by the setter
    lp_generic = chain.log_posterior(X)
    assert chain._device_fns is not fns_auto
    chain.likelihood_mode = "auto"
    np.testing.assert_allclose(
        np.asarray(chain.log_posterior(X)), np.asarray(lp_generic), rtol=1e-8
    )


def test_initial_state_check(chain_setup):
    """skip_initial_state_check is WIRED (emcee semantics): a resume state
    with non-finite posterior or a degenerate ensemble raises unless
    skipped."""
    chain, _, _ = chain_setup
    bad = np.full((8, 1, 3), 0.5)
    bad[0, 0, 0] = 1.5  # outside the box -> -inf posterior
    with open(chain.mcmc_path, "wb") as f:
        pickle.dump({"chain": bad}, f)
    with pytest.raises(ValueError, match="non-finite"):
        chain.run_mcmc(nsteps=4, nburnsteps=4, nwalkers=8, nthin=1)

    degenerate = np.full((8, 1, 3), 0.5)  # rank-0 ensemble
    with open(chain.mcmc_path, "wb") as f:
        pickle.dump({"chain": degenerate}, f)
    with pytest.raises(ValueError, match="linearly dependent"):
        chain.run_mcmc(nsteps=4, nburnsteps=4, nwalkers=8, nthin=1)
    # the escape hatch works
    chain.run_mcmc(nsteps=4, nburnsteps=4, nwalkers=8, nthin=1,
                   skip_initial_state_check=True)


def test_ensemble_de_move_gaussian_moments():
    """The differential-evolution move recovers a correlated Gaussian."""
    cov = jnp.asarray([[0.04, 0.03], [0.03, 0.04]])  # strong correlation
    cov_inv = jnp.linalg.inv(cov)
    mean = jnp.asarray([0.2, -0.4])

    def log_prob(x):
        d = x - mean
        return -0.5 * jnp.einsum("bi,ij,bj->b", d, cov_inv, d)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (64, 2)) * 0.05
    res = run_ensemble(log_prob, x0, 3000, jax.random.PRNGKey(1), move="de")
    samples = np.asarray(res.chain[:, 800:, :]).reshape(-1, 2)
    np.testing.assert_allclose(samples.mean(axis=0), mean, atol=0.05)
    np.testing.assert_allclose(np.cov(samples.T), cov, atol=0.012)


@pytest.mark.parametrize("move", ["snooker", "de-snooker"])
def test_ensemble_snooker_moves_gaussian_moments(move):
    """The DE-snooker move (and the 80/20 DE+snooker mixture) recovers a
    correlated Gaussian -- the line move's (d-1) log(|Y-z|/|X-z|) Jacobian
    factor is exactly what detailed balance needs, so any bias here would
    show up as wrong moments."""
    cov = jnp.asarray([[0.04, 0.03], [0.03, 0.04]])
    cov_inv = jnp.linalg.inv(cov)
    mean = jnp.asarray([0.2, -0.4])

    def log_prob(x):
        d = x - mean
        return -0.5 * jnp.einsum("bi,ij,bj->b", d, cov_inv, d)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (64, 2)) * 0.05
    res = run_ensemble(log_prob, x0, 3000, jax.random.PRNGKey(1), move=move)
    samples = np.asarray(res.chain[:, 800:, :]).reshape(-1, 2)
    np.testing.assert_allclose(samples.mean(axis=0), mean, atol=0.05)
    np.testing.assert_allclose(np.cov(samples.T), cov, atol=0.012)
    assert float(res.acceptance.mean()) > 0.1


def test_snooker_coincident_walkers_stay_finite():
    """All walkers starting at one point have no line direction; the
    proposal must degrade to a safe no-op (plus DE jitter in the mixture),
    never NaN."""
    def log_prob(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    x0 = jnp.ones((16, 2))
    res = run_ensemble(log_prob, x0, 50, jax.random.PRNGKey(3),
                       move="snooker")
    assert np.isfinite(np.asarray(res.chain)).all()


def test_unknown_move_raises():
    def log_prob(x):
        return -jnp.sum(x**2, axis=-1)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (8, 2))
    with pytest.raises(ValueError):
        run_ensemble(log_prob, x0, 2, jax.random.PRNGKey(1), move="banana")


def test_posterior_gradient_matches_finite_difference(chain_setup):
    """The sampling likelihood uses the custom-VJP fast-gradient predict
    (gp._norm_mean_var); its reverse gradient through the full Woodbury
    posterior must match central finite differences."""
    chain, _, _ = chain_setup
    log_post, state = chain.posterior_with_state()

    theta = jnp.asarray([[0.55, 0.45, 0.6]], dtype=jnp.float64)
    g = np.asarray(
        jax.grad(lambda t: jnp.sum(log_post(state, t)))(theta)
    )[0]

    h = 1e-6
    fd = np.empty(3)
    for d in range(3):
        up = np.array(theta, dtype=np.float64)
        dn = np.array(theta, dtype=np.float64)
        up[0, d] += h
        dn[0, d] -= h
        lp_up = float(log_post(state, jnp.asarray(up))[0])
        lp_dn = float(log_post(state, jnp.asarray(dn))[0])
        fd[d] = (lp_up - lp_dn) / (2 * h)
    np.testing.assert_allclose(g, fd, rtol=5e-5, atol=1e-4)


def test_log_likelihood_point_by_point_alias(chain_setup, rng):
    """API-parity alias (reference loops per point, src/mcmc.py:225-258);
    here it must equal the batch path exactly."""
    chain, _, _ = chain_setup
    X = rng.uniform(0.2, 0.8, size=(6, 3))
    np.testing.assert_array_equal(
        chain.log_likelihood_point_by_point(X), chain.log_likelihood(X)
    )


def test_run_ensemble_rejects_odd_walkers():
    """The red-black ensemble update needs even halves; emcee raises for
    odd counts and so do we (round-4 review: odd ensembles used to run
    silently with 2-vs-3 halves)."""
    from gpbayestools_hic_tpu.samplers.ensemble import run_ensemble

    def lp(state, x):
        return -0.5 * np.sum(x**2, axis=-1)

    x0 = jnp.zeros((5, 2))
    with pytest.raises(ValueError, match="even"):
        run_ensemble(lp, x0, 2, jax.random.PRNGKey(0), state=())
