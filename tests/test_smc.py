"""SMC sampler tests: flow correctness, Gaussian posterior + evidence, Chain."""

import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpbayestools_hic_tpu.samplers.flows import (
    FlowConfig,
    fit_flow,
    flow_forward,
    flow_inverse,
    flow_logprob,
    init_flow,
)
from gpbayestools_hic_tpu.samplers.smc import run_smc


CFG = FlowConfig(n_layers=4, hidden=32)


def test_flow_inverse_roundtrip():
    key = jax.random.PRNGKey(0)
    params = init_flow(key, 3, CFG, jnp.float64)
    u = jax.random.normal(jax.random.PRNGKey(1), (50, 3), jnp.float64) * 2 + 1
    z, ld_f = flow_forward(params, u, CFG)
    u2, ld_i = flow_inverse(params, z, CFG)
    np.testing.assert_allclose(u2, u, atol=1e-8)
    np.testing.assert_allclose(ld_f + ld_i, 0.0, atol=1e-8)


@pytest.mark.slow
def test_flow_fits_correlated_gaussian():
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    cov = np.array([[1.0, 0.8], [0.8, 1.0]])
    data = rng.multivariate_normal([2.0, -1.0], cov, size=2000)
    u = jnp.asarray(data)
    params = init_flow(key, 2, CFG, u.dtype)
    params, loss = fit_flow(
        params, u, jnp.ones(len(u), u.dtype), jax.random.PRNGKey(1),
        config=CFG, steps=500,
    )
    # average log-likelihood should approach the true entropy rate
    true_ll = -0.5 * (2 * np.log(2 * np.pi) + np.log(np.linalg.det(cov)) + 2)
    fitted_ll = float(jnp.mean(flow_logprob(params, u, CFG)))
    assert fitted_ll > true_ll - 0.25, (fitted_ll, true_ll)
    # latent should be ~ standard normal
    z, _ = flow_forward(params, u, CFG)
    z = np.asarray(z)
    assert np.abs(z.mean(axis=0)).max() < 0.25
    assert np.abs(z.std(axis=0) - 1).max() < 0.25


def test_fit_flow_patience_returns_best_params():
    """The patience path must return the best-seen parameters: the reported
    loss has to match a fresh evaluation of the returned params (the old
    code returned the LAST params with the loss of the best ones)."""
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=(256, 2)) @ np.array([[1.0, 0.6], [0.0, 0.8]]))
    w = jnp.ones(len(u), u.dtype)
    params = init_flow(jax.random.PRNGKey(0), 2, CFG, u.dtype)
    fitted, loss = fit_flow(params, u, w, jax.random.PRNGKey(1),
                            config=CFG, steps=300, patience=20)
    # fit_flow normalizes the weights internally; uniform w -> plain mean
    fresh = float(-jnp.mean(flow_logprob(fitted, u, CFG)))
    assert abs(fresh - float(loss)) < 1e-3 * max(1.0, abs(fresh)), (fresh, loss)


def test_fit_flow_dynamic_one_program_for_all_budgets():
    """The traced step budget must NOT recompile per budget -- the SMC loop
    relies on the cold first fit and the warm refits sharing one compiled
    program (a static budget cost one extra multi-second remote compile per
    fresh-process SMC run)."""
    from gpbayestools_hic_tpu.samplers.flows import fit_flow_dynamic

    cfg = FlowConfig(n_layers=2, hidden=16, coupling="affine")
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(1.0, 0.5, size=(128, 2)))
    w = jnp.ones(len(u), u.dtype)
    p0 = init_flow(jax.random.PRNGKey(0), 2, cfg, u.dtype)

    fit_j = jax.jit(
        lambda p, uu, ww, s: fit_flow_dynamic(p, uu, ww, s, config=cfg)
    )
    p_a, loss_a = fit_j(p0, u, w, jnp.asarray(120, jnp.int32))
    p_b, loss_b = fit_j(p0, u, w, jnp.asarray(40, jnp.int32))
    assert fit_j._cache_size() == 1
    assert np.isfinite(float(loss_a)) and np.isfinite(float(loss_b))
    # the longer budget should fit at least as well (both return best-seen)
    assert float(loss_a) <= float(loss_b) + 1e-6

    # and the fit quality matches the static fit_flow at the same budget
    p_s, _ = fit_flow(p0, u, w, jax.random.PRNGKey(1), config=cfg, steps=120)
    ll_dyn = float(jnp.mean(flow_logprob(p_a, u, cfg)))
    ll_sta = float(jnp.mean(flow_logprob(p_s, u, cfg)))
    assert abs(ll_dyn - ll_sta) < 0.3, (ll_dyn, ll_sta)


def test_mixture_terms_rejects_nan_likelihoods():
    """A NaN history log-likelihood must get ~zero posterior weight, not
    logl=0 (which would dominate every real strongly-negative particle)."""
    from gpbayestools_hic_tpu.samplers.smc import _mixture_terms

    logl = np.array([-500.0, -510.0, np.nan, -np.inf])
    lc, lm = _mixture_terms(
        logl, betas=np.array([0.5, 1.0]), logzs=np.array([-200.0, -400.0]),
        counts=np.array([2.0, 2.0]),
    )
    lw = lc - lm  # beta = 1 weights
    assert np.isfinite(lw[:2]).all()
    # the NaN and -inf particles must be negligible next to the real ones
    assert lw[2] < lw[:2].min() - 1e5
    assert lw[3] < lw[:2].min() - 1e5


@pytest.mark.slow
def test_smc_gaussian_posterior_and_evidence():
    """Known Gaussian likelihood in a unit box: check moments AND evidence.

    With prior U([0,1]^2) and likelihood N(x; mu, s^2 I) well inside the box,
    Z = integral = ~1 * (2 pi s^2)^-0 ... here logl is a proper normalized
    Gaussian log-density, so Z ~= 1 and log Z ~= 0 (edge effects tiny).

    The persistent-sampling posterior is WEIGHTED (pocoMC contract): the
    nonuniform importance weights must integrate to the correct moments.
    """
    mu = jnp.asarray([0.4, 0.6])
    s = 0.05

    def logl(state, x, finite):
        ll = -0.5 * jnp.sum((x - mu) ** 2, axis=1) / s**2 - jnp.log(
            2 * jnp.pi * s**2
        )
        return ll

    lo = jnp.zeros(2)
    hi = jnp.ones(2)
    result = run_smc(
        logl, lo, hi,
        n_effective=500, n_active=250, n_prior=1000,
        n_max_steps=30, n_total=3000, n_evidence=2000, seed=1,
        flow_config=CFG, flow_fit_steps=200,
    )
    samples, w = result["samples"], result["weights"]
    assert samples.shape[1] == 2
    assert samples.shape[0] == w.shape[0] == result["logl"].shape[0]
    # real (nonuniform) importance weights, normalized, with ESS >= n_total
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-10)
    assert w.std() > 0.0
    assert result["ess"] >= 3000
    mean_w = np.average(samples, axis=0, weights=w)
    std_w = np.sqrt(np.average((samples - mean_w) ** 2, axis=0, weights=w))
    np.testing.assert_allclose(mean_w, mu, atol=0.02)
    np.testing.assert_allclose(std_w, s, rtol=0.2)
    # prior volume is 1 and the likelihood is normalized: log Z ~ 0
    assert abs(result["logz"]) < 0.1, result["logz"]
    assert result["logz_err"] < 0.1
    assert np.isfinite(result["logl"]).all()
    # logp of in-box samples = -log(volume) = 0
    np.testing.assert_allclose(result["logp"], 0.0, atol=1e-5)
    # the adaptive MCMC phase never exceeds the cap, and on this easy
    # posterior averages well under it (fewer evaluations than the old
    # fixed-length schedule)
    assert result["total_mcmc_steps"] <= 30 * result["beta_iterations"]
    assert result["total_mcmc_steps"] / result["beta_iterations"] < 20


@pytest.mark.slow
def test_smc_logz_error_calibration_repeat_seeds():
    """The reported logz_err must be CALIBRATED: on the analytic Gaussian
    box (true log Z ~= 0), across >= 5 independent seeds, every |logz| stays
    within 3 * logz_err, and the reported error is neither wildly
    over-reported (> 3x the actual scatter) nor under-reported -- for BOTH
    the IS estimate (logz/logz_err) and the persistent-sampling bootstrap
    (logz_ps/logz_err_ps)."""
    mu = jnp.asarray([0.4, 0.6])
    s = 0.05

    def logl(state, x, finite):
        return -0.5 * jnp.sum((x - mu) ** 2, axis=1) / s**2 - jnp.log(
            2 * jnp.pi * s**2
        )

    lo, hi = jnp.zeros(2), jnp.ones(2)
    logzs, errs, logzs_ps, errs_ps = [], [], [], []
    for seed in range(5):
        r = run_smc(
            logl, lo, hi,
            n_effective=400, n_active=200, n_prior=800,
            n_max_steps=25, n_total=2000, n_evidence=1000, seed=10 + seed,
            flow_config=CFG, flow_fit_steps=200,
        )
        logzs.append(r["logz"])
        errs.append(r["logz_err"])
        logzs_ps.append(r["logz_ps"])
        errs_ps.append(r["logz_err_ps"])
        # the defensive estimator's tail diagnostic must be healthy on the
        # calibrated target in EVERY repeat (an occasional khat excursion
        # would mean the t-tail/defensive mixture is not doing its job)
        assert r["logz_khat"] is not None and r["logz_khat"] < 0.7, r["logz_khat"]

    logzs, errs = np.asarray(logzs), np.asarray(errs)
    logzs_ps, errs_ps = np.asarray(logzs_ps), np.asarray(errs_ps)
    # coverage: every run's truth (0) within 3 sigma of its own estimate
    assert np.all(np.abs(logzs) < 3.0 * errs), (logzs, errs)
    assert np.all(np.abs(logzs_ps) < 3.0 * errs_ps), (logzs_ps, errs_ps)
    # the error is an ESTIMATE of the scatter: not over-reported by > 3x
    # (rms over |logz - 0| is the actual error including bias)
    actual = max(np.sqrt(np.mean(logzs**2)), 1e-4)
    actual_ps = max(np.sqrt(np.mean(logzs_ps**2)), 1e-4)
    assert np.median(errs) < 3.0 * actual, (np.median(errs), actual)
    assert np.median(errs_ps) < 3.0 * actual_ps, (np.median(errs_ps), actual_ps)


@pytest.mark.slow
def test_smc_banana_evidence_curved_posterior():
    """Known evidence on a CURVED (banana) posterior -- the geometry that
    stresses the moment-matched elliptical evidence proposal (this is a
    2-d version of the flagship's curved-ridge regime where khat runs
    hot).  The likelihood is a normalized density in the curved
    coordinates, fully inside the box, so log Z ~= 0; the selected
    estimate must cover it within its stated error."""
    s1, s2, curv = 0.12, 0.02, 8.0

    def logl(state, x, finite):
        # normalized banana: y1 = x0 - 0.5, y2 = (x1 - 0.5) - curv*y1^2
        y1 = x[:, 0] - 0.5
        y2 = (x[:, 1] - 0.55) + curv * y1**2
        return (
            -0.5 * (y1 / s1) ** 2 - 0.5 * (y2 / s2) ** 2
            - np.log(2 * np.pi * s1 * s2)
        )

    result = run_smc(
        logl, jnp.zeros(2), jnp.ones(2),
        n_effective=600, n_active=300, n_prior=1200,
        n_max_steps=30, n_total=4000, n_evidence=2000, seed=11,
        flow_config=RQS_CFG, flow_fit_steps=250,
    )
    # the curved ridge is covered: weighted mean on x0 ~ 0.5 and the
    # posterior bends (x1 mean below the ridge apex)
    mean_w = np.average(result["samples"], axis=0, weights=result["weights"])
    assert abs(mean_w[0] - 0.5) < 0.03
    # selected evidence covers the analytic logZ ~= 0 within 3 sigma
    assert abs(result["logz"]) < 3.0 * result["logz_err"] + 0.05, (
        result["logz"], result["logz_err"], result["logz_source"])
    # every estimator pair is reported; PS itself is also calibrated here
    assert abs(result["logz_ps"]) < 3.0 * result["logz_err_ps"] + 0.05
    assert result["logz_is"] is not None
    assert result["logz_bridge"] is not None


@pytest.mark.slow
def test_smc_bimodal_recovers_both_modes():
    """The flow-preconditioner + tempering must keep both modes."""
    m1 = jnp.asarray([0.25, 0.25])
    m2 = jnp.asarray([0.75, 0.75])
    s = 0.04

    def logl(state, x, finite):
        l1 = -0.5 * jnp.sum((x - m1) ** 2, axis=1) / s**2
        l2 = -0.5 * jnp.sum((x - m2) ** 2, axis=1) / s**2
        return jnp.logaddexp(l1, l2)

    result = run_smc(
        logl, jnp.zeros(2), jnp.ones(2),
        n_effective=500, n_active=250, n_prior=1000,
        n_max_steps=30, n_total=4000, n_evidence=0, seed=3,
        flow_config=CFG, flow_fit_steps=200,
    )
    samples, w = result["samples"], result["weights"]
    frac_mode1 = np.sum(w * (samples[:, 0] < 0.5))
    assert 0.2 < frac_mode1 < 0.8, frac_mode1


@pytest.mark.slow
def test_chain_run_pocomc(tmp_path, rng, training_pickle_factory):
    """Chain.run_pocoMC end to end with the full pickle contract."""
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
    out = chain.run_pocoMC(
        n_effective=300, n_active=150, n_prior=600, n_max_steps=20,
        n_total=2000, n_evidence=500,
    )
    with open(chain.mcmc_path, "rb") as f:
        data = pickle.load(f)
    for k in ("chain", "weights", "logl", "logp", "logz", "logz_err",
              "logz_source", "logz_ps", "logz_err_ps", "logz_is",
              "logz_err_is", "logz_khat", "logz_bridge", "logz_err_bridge"):
        assert k in data
    # checkpointing is on by default: the sampler state file sits next to
    # the chain pickle (run_pocoMC(resume=True) continues from it)
    assert (chain.mcmc_path.parent / "smc_checkpoint.pkl").exists()
    # persistent sampling: the run terminates once the weight ESS reaches
    # n_total, so at least that many (weighted) samples come back
    assert data["chain"].shape[0] >= 2000 and data["chain"].shape[1] == 2
    assert data["weights"].shape == (data["chain"].shape[0],)
    assert data["weights"].std() > 0.0  # real importance weights, not 1/n
    post_mean = np.average(data["chain"], axis=0, weights=data["weights"])
    assert np.all(np.abs(post_mean - truth) < 0.2), post_mean
    assert np.isfinite(data["logz"])


RQS_CFG = FlowConfig(n_layers=4, hidden=32, coupling="rqs", rqs_bins=6)


@pytest.mark.slow
def test_rqs_flow_roundtrip_and_identity_init():
    import jax

    key = jax.random.PRNGKey(0)
    params = init_flow(key, 3, RQS_CFG, jnp.float64)
    u = jax.random.normal(jax.random.PRNGKey(1), (40, 3), jnp.float64) * 2
    # zero-initialized conditioner (+ zero pre-layer) => identity transform
    z, ld = flow_forward(params, u, RQS_CFG)
    np.testing.assert_allclose(z, u, atol=1e-8)
    np.testing.assert_allclose(ld, 0.0, atol=1e-8)
    # perturb (realistic trained-flow regime; extreme softmax-collapsed
    # bins at >=0.2 perturbation stress the inverse quadratic beyond what
    # weight-decayed training ever produces) and check inverse + logdet
    params = jax.tree.map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(2), x.shape, x.dtype)
        if x.ndim == 2 else x,
        params,
    )
    z, ld_f = flow_forward(params, u, RQS_CFG)
    u2, ld_i = flow_inverse(params, z, RQS_CFG)
    np.testing.assert_allclose(u2, u, atol=1e-7)
    np.testing.assert_allclose(ld_f + ld_i, 0.0, atol=1e-7)

    def fwd_single(ui):
        return flow_forward(params, ui[None, :], RQS_CFG)[0][0]

    jac = jax.jacobian(fwd_single)(u[0])
    true_ld = float(jnp.log(jnp.abs(jnp.linalg.det(jac))))
    np.testing.assert_allclose(float(ld_f[0]), true_ld, rtol=1e-8)


@pytest.mark.slow
def test_rqs_flow_fits_banana():
    """The spline flow should fit a curved (banana) density better than a
    same-size affine flow."""
    import jax

    rng = np.random.default_rng(0)
    x1 = rng.normal(size=4000)
    x2 = 0.5 * x1**2 - 1.0 + 0.3 * rng.normal(size=4000)
    u = jnp.asarray(np.stack([x1, x2], axis=1))
    w = jnp.ones(len(u), u.dtype)

    aff_cfg = FlowConfig(n_layers=4, hidden=32)
    p_aff = init_flow(jax.random.PRNGKey(0), 2, aff_cfg, u.dtype)
    p_aff, _ = fit_flow(p_aff, u, w, jax.random.PRNGKey(1), config=aff_cfg, steps=400)
    ll_aff = float(jnp.mean(flow_logprob(p_aff, u, aff_cfg)))

    p_rqs = init_flow(jax.random.PRNGKey(0), 2, RQS_CFG, u.dtype)
    p_rqs, _ = fit_flow(p_rqs, u, w, jax.random.PRNGKey(1), config=RQS_CFG, steps=400)
    ll_rqs = float(jnp.mean(flow_logprob(p_rqs, u, RQS_CFG)))
    assert ll_rqs > ll_aff - 0.05, (ll_rqs, ll_aff)


@pytest.mark.slow
def test_smc_with_rqs_preconditioner():
    mu = jnp.asarray([0.4, 0.6])
    s = 0.05

    def logl(state, x, finite):
        return -0.5 * jnp.sum((x - mu) ** 2, axis=1) / s**2 - jnp.log(
            2 * jnp.pi * s**2
        )

    result = run_smc(
        logl, jnp.zeros(2), jnp.ones(2),
        n_effective=400, n_active=200, n_prior=800,
        n_max_steps=25, n_total=2000, n_evidence=1000, seed=2,
        flow_config=RQS_CFG, flow_fit_steps=200,
    )
    mean_w = np.average(result["samples"], axis=0, weights=result["weights"])
    np.testing.assert_allclose(mean_w, mu, atol=0.02)
    assert abs(result["logz"]) < 0.15, result["logz"]


@pytest.mark.slow
def test_smc_custom_scipy_prior():
    """A non-uniform (truncated normal-like) prior changes the posterior and
    the evidence correctly."""
    from scipy.stats import norm, uniform as sp_uniform

    from gpbayestools_hic_tpu.utils.priors import ScipyPrior

    s = 0.08
    mu = jnp.asarray([0.5, 0.5])

    def logl(state, x, finite):
        return -0.5 * jnp.sum((x - mu) ** 2, axis=1) / s**2 - jnp.log(
            2 * jnp.pi * s**2
        )

    # prior: tight normal on dim 0 centered at 0.3, uniform on dim 1
    prior = ScipyPrior([norm(loc=0.3, scale=0.05), sp_uniform(0, 1)])
    result = run_smc(
        logl, jnp.zeros(2), jnp.ones(2),
        n_effective=400, n_active=200, n_prior=800,
        n_max_steps=25, n_total=3000, n_evidence=0, seed=4,
        flow_config=CFG, flow_fit_steps=200, custom_prior=prior,
    )
    samples, w = result["samples"], result["weights"]
    # posterior mean on dim 0 pulled toward the prior: analytic product of
    # normals: mean = (0.5/s^2 + 0.3/0.05^2)/(1/s^2 + 1/0.05^2)
    expected0 = (0.5 / s**2 + 0.3 / 0.05**2) / (1 / s**2 + 1 / 0.05**2)
    np.testing.assert_allclose(np.average(samples[:, 0], weights=w), expected0, atol=0.02)
    np.testing.assert_allclose(np.average(samples[:, 1], weights=w), 0.5, atol=0.02)
    # logp reflects the custom prior, not the uniform box
    assert result["logp"].std() > 0.1


@pytest.mark.slow
def test_smc_rwm_kernel():
    """The random-walk-Metropolis kernel (pocoMC's alternative to tpcn,
    src/mcmc.py:760-762) is a real sampler, not a silent pcn fallback."""
    mu = jnp.asarray([0.35, 0.65])
    s = 0.06

    def logl(state, x, finite):
        return -0.5 * jnp.sum((x - mu) ** 2, axis=1) / s**2 - jnp.log(
            2 * jnp.pi * s**2
        )

    result = run_smc(
        logl, jnp.zeros(2), jnp.ones(2), sample="rwm",
        n_effective=400, n_active=200, n_prior=800,
        n_max_steps=30, n_total=2000, n_evidence=0, seed=5,
        flow_config=CFG, flow_fit_steps=200,
    )
    mean_w = np.average(result["samples"], axis=0, weights=result["weights"])
    np.testing.assert_allclose(mean_w, mu, atol=0.03)


def test_run_pocomc_resume_requires_checkpoint(tmp_path):
    """resume=True with checkpoint=False must raise up front: silently
    restarting a killed production run from scratch is the one outcome
    the resume feature exists to prevent (round-5 review finding)."""
    import pickle as pkl

    from gpbayestools_hic_tpu.samplers import Chain

    parfile = tmp_path / "p.txt"
    parfile.write_text("p0: l, 0, 1\n")
    with open(tmp_path / "exp.pkl", "wb") as f:
        pkl.dump({"0": {"obs": np.array([[1.0], [0.1]])}}, f)
    c = Chain(mcmc_path=str(tmp_path / "m" / "c.pkl"),
              expdata_path=str(tmp_path / "exp.pkl"),
              model_parafile=str(parfile))
    with pytest.raises(ValueError, match="checkpoint"):
        c.run_pocoMC(resume=True, checkpoint=False)


def test_smc_rejects_n_active_above_n_effective():
    def logl(state, x, finite):
        return -jnp.sum(x**2, axis=1)

    with pytest.raises(ValueError, match="n_active"):
        run_smc(
            logl, jnp.zeros(2), jnp.ones(2),
            n_effective=100, n_active=200, n_prior=400, n_total=100,
            n_evidence=0, flow_config=CFG,
        )


def test_smc_rejects_numpy_only_prior():
    class BadPrior:
        dim = 2

        def logpdf(self, x):
            return np.zeros(len(x))

        def rvs(self, size):
            return np.random.rand(size, 2)

    def logl(state, x, finite):
        return -jnp.sum(x**2, axis=1)

    with pytest.raises(ValueError, match="log_prior_jax"):
        run_smc(
            logl, jnp.zeros(2), jnp.ones(2),
            n_effective=100, n_active=50, n_prior=200, n_total=100,
            n_evidence=0, custom_prior=BadPrior(), flow_config=CFG,
        )


def test_smc_custom_prior_mass_outside_box(caplog):
    """A prior with substantial mass outside the box must be
    rejection-sampled into it (no boundary pile-up from clipping) with the
    truncated mass entering the mixture normalizer, and the posterior must
    still match the analytic product of prior and likelihood."""
    import logging

    from scipy.stats import norm, uniform as sp_uniform

    from gpbayestools_hic_tpu.utils.priors import ScipyPrior

    s = 0.08
    mu = jnp.asarray([0.5, 0.5])

    def logl(state, x, finite):
        return -0.5 * jnp.sum((x - mu) ** 2, axis=1) / s**2

    # ~9% of dim-0 prior mass lies below 0; none of it may end up clipped
    # onto the box face
    prior = ScipyPrior([norm(loc=0.4, scale=0.3), sp_uniform(0, 1)])
    with caplog.at_level(
        logging.WARNING, logger="gpbayestools_hic_tpu.samplers.smc"
    ):
        result = run_smc(
            logl, jnp.zeros(2), jnp.ones(2),
            n_effective=300, n_active=150, n_prior=600,
            n_max_steps=25, n_total=2000, n_evidence=0, seed=6,
            flow_config=CFG, flow_fit_steps=150, custom_prior=prior,
        )
    assert any(
        "outside the sampling box" in r.getMessage() for r in caplog.records
    )
    samples, w = result["samples"], result["weights"]
    frac_edge = np.mean((samples[:, 0] < 1e-6) | (samples[:, 0] > 1 - 1e-6))
    assert frac_edge < 0.005, frac_edge
    expected0 = (0.5 / s**2 + 0.4 / 0.3**2) / (1 / s**2 + 1 / 0.3**2)
    np.testing.assert_allclose(
        np.average(samples[:, 0], weights=w), expected0, atol=0.03
    )


def test_psis_smooth_recovers_tail_index():
    """khat must estimate the true GPD tail index of the weight
    distribution, and smoothing must only touch the tail (non-tail weights
    unchanged, max weight reduced)."""
    from gpbayestools_hic_tpu.samplers.smc import _psis_smooth

    rng = np.random.default_rng(0)
    k_true = 0.5
    # w = exp(k * Exp(1)) has survival P(w > t) = t^(-1/k): GPD index k
    log_w = k_true * rng.exponential(size=5000)
    smoothed, khat = _psis_smooth(log_w)
    assert abs(khat - k_true) < 0.12, khat
    # the tail is the M largest; everything else is untouched
    m_tail = min(len(log_w) // 5, int(3 * np.sqrt(len(log_w))))
    order = np.argsort(log_w)
    np.testing.assert_array_equal(
        smoothed[order[: len(log_w) - m_tail]],
        log_w[order[: len(log_w) - m_tail]],
    )
    # smoothing never exceeds the raw max (the GPD quantiles are capped
    # there) and replaces the tail with a strictly ordered smooth ramp
    assert smoothed.max() <= log_w.max() + 1e-12
    tail_sorted = smoothed[order[-m_tail:]]
    assert np.all(np.diff(tail_sorted) >= 0)
    assert not np.array_equal(tail_sorted, log_w[order[-m_tail:]])


def test_psis_smooth_light_tail_khat_negative():
    """Bounded (uniform-like) weights have a negative GPD index: khat must
    come out well under the 0.7 unreliability ceiling."""
    from gpbayestools_hic_tpu.samplers.smc import _psis_smooth

    rng = np.random.default_rng(1)
    log_w = np.log(rng.uniform(0.5, 1.5, size=4000))
    _, khat = _psis_smooth(log_w)
    assert np.isfinite(khat) and khat < 0.3, khat


def test_psis_smooth_tiny_tail_is_identity():
    from gpbayestools_hic_tpu.samplers.smc import _psis_smooth

    log_w = np.array([0.0, 1.0, 2.0, 0.5, 1.5])
    out, khat = _psis_smooth(log_w)
    np.testing.assert_array_equal(out, log_w)
    assert np.isnan(khat)


def test_psis_smooth_zero_weight_majority_stays_zero():
    """-inf (exact-zero) weights must NEVER be smoothed into positive
    mass: with 90% zero-weight draws a count-based tail would reach into
    them and the GPD fit would fabricate weight for draws that
    contributed none (round-5 review finding).  The tail is sized from
    the FINITE count instead."""
    from gpbayestools_hic_tpu.samplers.smc import _psis_smooth

    rng = np.random.default_rng(0)
    n = 2000
    log_w = np.full(n, -np.inf)
    fin = rng.normal(size=120)
    log_w[:120] = fin
    out, khat = _psis_smooth(log_w)
    # every zero-weight draw is untouched
    assert np.all(np.isneginf(out[120:]))
    # the finite weights' total mass is not inflated (cap at raw max)
    assert out[:120].max() <= fin.max() + 1e-12
    # a tiny finite set (< 25) cannot support a tail fit at all
    log_w2 = np.full(n, -np.inf)
    log_w2[:10] = rng.normal(size=10)
    out2, khat2 = _psis_smooth(log_w2)
    np.testing.assert_array_equal(out2, log_w2)
    assert np.isnan(khat2)


def test_evidence_t_proposal_density_and_draws():
    """The analytic evidence proposal: _t_proposal_logpdf must equal
    scipy's multivariate-t, _t_proposal_draw must sample that density
    (moment check), and the moment-matched fit must reproduce a weighted
    sample's mean/covariance exactly."""
    from scipy.stats import multivariate_t

    from gpbayestools_hic_tpu.samplers.smc import (
        _fit_t_proposal, _t_proposal_draw, _t_proposal_logpdf,
    )

    rng = np.random.default_rng(0)
    d, nu = 3, 5.0
    cov = np.array([[1.0, 0.6, 0.0], [0.6, 2.0, 0.3], [0.0, 0.3, 0.5]])
    mean = np.array([1.0, -2.0, 0.5])
    u_hist = rng.multivariate_normal(mean, cov, size=6000)
    log_w = np.zeros(len(u_hist))
    prop = _fit_t_proposal(u_hist, log_w, nu)
    # moment matching: the t's COVARIANCE (scale * nu/(nu-2)) equals the
    # weighted sample covariance
    scale = prop["chol"] @ prop["chol"].T
    np.testing.assert_allclose(prop["mu"], u_hist.mean(0), atol=1e-10)
    np.testing.assert_allclose(
        scale * nu / (nu - 2.0), np.cov(u_hist.T, bias=True), rtol=1e-8
    )
    # exact density vs scipy
    pts = rng.normal(size=(50, d)) * 2.0
    expected = multivariate_t.logpdf(pts, loc=prop["mu"], shape=scale, df=nu)
    np.testing.assert_allclose(_t_proposal_logpdf(prop, pts), expected,
                               rtol=1e-10)
    # draws follow the claimed density: mean + covariance (t with nu=5
    # has finite covariance = scale * nu/(nu-2))
    draws = _t_proposal_draw(rng, prop, 40000)
    np.testing.assert_allclose(draws.mean(0), prop["mu"], atol=0.05)
    np.testing.assert_allclose(
        np.cov(draws.T, bias=True), scale * nu / (nu - 2.0),
        atol=0.15, rtol=0.15,
    )
    # nonuniform weights move the fit
    log_w2 = np.where(u_hist[:, 0] > 1.0, 0.0, -np.inf)
    prop2 = _fit_t_proposal(u_hist, log_w2, nu)
    assert prop2["mu"][0] > prop["mu"][0] + 0.5


def test_bridge_logz_analytic_gaussian():
    """Optimal bridge must recover a known normalizer from proposal and
    posterior draws -- including a badly-mismatched proposal (shifted,
    too narrow: the flow-undercoverage regime) where raw IS is biased
    low with a confidently small error."""
    from scipy.stats import norm

    from gpbayestools_hic_tpu.samplers.smc import _bridge_err, _bridge_logz

    rng = np.random.default_rng(0)
    true_logz = 3.7   # target density: exp(true_logz) * N(x; 0, 1)

    def run_case(q_mu, q_sd, n=4000):
        xq = rng.normal(q_mu, q_sd, n)
        xp = rng.normal(0.0, 1.0, n)

        def lw(x):
            return (true_logz + norm.logpdf(x, 0, 1)
                    - norm.logpdf(x, q_mu, q_sd))

        return lw(xq), lw(xp)

    # well-matched proposal
    lw_q, lw_p = run_case(0.0, 1.2)
    z = _bridge_logz(lw_q, lw_p, 0.0)
    assert abs(z - true_logz) < 0.05, z
    err = _bridge_err(lw_q, lw_p, z, rng)
    assert np.isfinite(err) and abs(z - true_logz) < 4 * max(err, 1e-3)

    # undercovering proposal: q misses most of the posterior mass
    lw_q, lw_p = run_case(2.5, 04.0e-1)
    raw_is = lw_q.max() + np.log(np.mean(np.exp(lw_q - lw_q.max())))
    z = _bridge_logz(lw_q, lw_p, raw_is)
    err = _bridge_err(lw_q, lw_p, z, rng)
    # raw IS is badly biased low here; the bridge is not
    assert raw_is < true_logz - 0.5, raw_is
    assert abs(z - true_logz) < max(5 * err, 0.3), (z, err)

    # degenerate inputs return nan rather than garbage
    assert np.isnan(_bridge_logz(np.array([]), lw_p, 0.0))
    assert np.isnan(_bridge_logz(lw_q, lw_p, np.inf))


def test_smc_checkpoint_knob_mismatch_rejected(tmp_path):
    from gpbayestools_hic_tpu.samplers.smc import (
        _load_smc_checkpoint, _save_smc_checkpoint,
    )

    path = tmp_path / "ck.pkl"
    knobs = {"n_prior": 100, "n_active": 50, "sample": "tpcn", "seed": 1,
             "flow_fit_steps": 300, "box_lo": (0.0, 0.0)}
    _save_smc_checkpoint(path, {"version": 1, "knobs": knobs, "beta": 0.5})
    assert _load_smc_checkpoint(path, knobs)["beta"] == 0.5
    with pytest.raises(ValueError, match="different settings"):
        _load_smc_checkpoint(path, {**knobs, "n_active": 64})
    # dynamics-shaping knobs and the parameter box are part of the
    # fingerprint (round-5 review: a different flow budget silently broke
    # the bit-equality contract; a different Chain sharing the directory
    # could resume from foreign state)
    with pytest.raises(ValueError, match="different settings"):
        _load_smc_checkpoint(path, {**knobs, "flow_fit_steps": 100})
    with pytest.raises(ValueError, match="different settings"):
        _load_smc_checkpoint(path, {**knobs, "box_lo": (0.0, -1.0)})


@pytest.mark.slow
def test_smc_checkpoint_resume_exact(tmp_path):
    """A run killed after iteration k and resumed from its checkpoint must
    reproduce the uninterrupted run EXACTLY (full driver state -- history,
    rng/key streams, flow params, rho -- is serialized every iteration)."""
    mu = jnp.asarray([0.4, 0.6])
    s = 0.05

    def logl(state, x, finite):
        return -0.5 * jnp.sum((x - mu) ** 2, axis=1) / s**2 - jnp.log(
            2 * jnp.pi * s**2
        )

    lo, hi = jnp.zeros(2), jnp.ones(2)
    knobs = dict(
        n_effective=400, n_active=200, n_prior=800,
        n_max_steps=25, n_total=2000, n_evidence=800, seed=7,
        flow_config=CFG, flow_fit_steps=150,
    )
    full = run_smc(logl, lo, hi, **knobs)

    # "kill" after 2 iterations: max_iterations=2 stops both loops early;
    # the checkpoint then holds the state after iteration 2 -- exactly the
    # state a SIGKILL at that point would have left behind
    ck = tmp_path / "smc_checkpoint.pkl"
    partial_run = run_smc(
        logl, lo, hi, **knobs, max_iterations=2, checkpoint_path=ck
    )
    assert ck.exists()
    assert partial_run["beta_iterations"] == 2
    assert full["beta_iterations"] > 2  # genuinely interrupted mid-run

    resumed = run_smc(
        logl, lo, hi, **knobs, checkpoint_path=ck, resume=True
    )
    assert resumed["beta_iterations"] == full["beta_iterations"]
    np.testing.assert_allclose(resumed["samples"], full["samples"], rtol=1e-12)
    np.testing.assert_allclose(resumed["logl"], full["logl"], rtol=1e-12)
    np.testing.assert_allclose(resumed["weights"], full["weights"], rtol=1e-9)
    assert resumed["logz"] == pytest.approx(full["logz"], rel=1e-9)
    assert resumed["logz_err"] == pytest.approx(full["logz_err"], rel=1e-6)
    assert resumed["ess"] == pytest.approx(full["ess"], rel=1e-9)


@pytest.mark.slow
def test_smc_checkpoint_resume_exact_custom_prior(tmp_path):
    """Checkpoint/resume exactness must hold with a CUSTOM prior too: the
    restored rng stream drives both the evidence-phase prior draws and
    the defensive-mixture component, so a resumed run with a non-uniform
    prior must reproduce the uninterrupted evolution."""
    from scipy.stats import norm, uniform as sp_uniform

    from gpbayestools_hic_tpu.utils.priors import ScipyPrior

    s = 0.08
    mu = jnp.asarray([0.5, 0.5])

    def logl(state, x, finite):
        return -0.5 * jnp.sum((x - mu) ** 2, axis=1) / s**2 - jnp.log(
            2 * jnp.pi * s**2
        )

    prior = ScipyPrior([norm(loc=0.45, scale=0.15), sp_uniform(0, 1)])
    knobs = dict(
        n_effective=300, n_active=150, n_prior=600,
        n_max_steps=20, n_total=1500, n_evidence=600, seed=9,
        flow_config=CFG, flow_fit_steps=150, custom_prior=prior,
    )
    lo, hi = jnp.zeros(2), jnp.ones(2)
    full = run_smc(logl, lo, hi, **knobs)
    ck = tmp_path / "ck.pkl"
    partial_run = run_smc(logl, lo, hi, **knobs, max_iterations=2,
                          checkpoint_path=ck)
    assert partial_run["beta_iterations"] == 2 < full["beta_iterations"]
    resumed = run_smc(logl, lo, hi, **knobs, checkpoint_path=ck, resume=True)
    np.testing.assert_allclose(resumed["samples"], full["samples"], rtol=1e-12)
    assert resumed["logz"] == pytest.approx(full["logz"], rel=1e-9)
    assert resumed["logp"].std() > 0.1  # the custom prior is really in play


def test_select_evidence_rule():
    """_select_evidence: tighter estimator wins when they agree; a >3-sigma
    disagreement declares the IS estimate unreliable (flow-tail failure,
    measured on the flagship: IS 754.4+-0.7 vs PS 759.8+-0.3) and returns
    the PS value with the error inflated to at least half the gap."""
    from gpbayestools_hic_tpu.samplers.smc import _select_evidence

    # agree, IS tighter -> IS
    z, e, src, bad = _select_evidence(10.0, 0.5, 10.2, 0.1)
    assert (z, e, src, bad) == (10.2, 0.1, "is", False)
    # agree, PS tighter -> PS
    z, e, src, bad = _select_evidence(10.0, 0.1, 10.2, 0.5)
    assert (z, e, src, bad) == (10.0, 0.1, "ps", False)
    # flagship-style failure: 5.4-unit gap at sub-unit errors -> PS, err
    # inflated to half the gap, flagged unreliable
    z, e, src, bad = _select_evidence(759.8, 0.27, 754.4, 0.70)
    assert src == "ps" and z == 759.8 and bad
    assert e == pytest.approx(0.5 * 5.4, rel=1e-12)
    # exactly at the 3-sigma boundary: not declared a failure
    z, e, src, bad = _select_evidence(0.0, 1.0, 2.9, 0.0)
    assert src == "is" and not bad
    # heavy weight tail (khat > 0.7): the IS delta-method error is
    # inflated 3x BEFORE the cross-check and in the selected pair -- at
    # 0.3 it still beats PS's 0.5 here, so the agreeing IS wins with the
    # honest (inflated) error
    z, e, src, bad = _select_evidence(10.0, 0.5, 10.2, 0.1, 0.9)
    assert (z, src, bad) == (10.2, "is", False)
    assert e == pytest.approx(0.3)
    # ... and when PS is tighter than the inflated IS error, PS wins
    z, e, src, bad = _select_evidence(10.0, 0.2, 10.2, 0.1, 0.9)
    assert (z, e, src, bad) == (10.0, 0.2, "ps", False)
    # the flagship failure shape WITH a bad khat: the inflated error
    # still cannot cover a 5.4-unit gap -> dropped, PS flagged+inflated
    z, e, src, bad = _select_evidence(760.3, 0.27, 754.8, 0.5, 1.98)
    assert (z, src, bad) == (760.3, "ps", True)
    assert e == pytest.approx(0.5 * 5.5, rel=1e-2)
    # healthy khat keeps the tighter-wins rule
    z, e, src, bad = _select_evidence(10.0, 0.5, 10.2, 0.1, 0.3)
    assert (z, e, src, bad) == (10.2, 0.1, "is", False)
    # no khat available (tiny n_evidence): rule unchanged
    z, e, src, bad = _select_evidence(10.0, 0.5, 10.2, 0.1, None)
    assert (z, e, src, bad) == (10.2, 0.1, "is", False)


def test_run_smc_reports_both_evidence_estimators():
    """The result dict carries both estimator pairs and names its source;
    on this easy calibrated target the two agree (no forced PS fallback)."""
    mu = jnp.asarray([0.4, 0.6])
    s = 0.05

    def logl(state, x, finite):
        return (-0.5 * jnp.sum((x - mu) ** 2, axis=1) / s**2
                - jnp.log(2 * jnp.pi * s**2))

    result = run_smc(
        logl, jnp.zeros(2), jnp.ones(2),
        n_effective=400, n_active=200, n_prior=800,
        n_max_steps=25, n_total=2000, n_evidence=1000, seed=3,
        flow_config=CFG, flow_fit_steps=200,
    )
    assert result["logz_source"] in ("ps", "is", "bridge")
    assert result["logz_is"] is not None and result["logz_err_is"] is not None
    # both estimators near the analytic logZ ~= 0 on this target
    assert abs(result["logz_ps"]) < 0.5, result["logz_ps"]
    assert abs(result["logz_is"]) < 0.5, result["logz_is"]
    # the PSIS tail diagnostic of the defensive proposal is reported and
    # healthy on this easy calibrated target
    assert result["logz_khat"] is not None
    assert result["logz_khat"] < 0.7, result["logz_khat"]
    # the bridge refinement is computed and near the analytic logZ ~= 0
    assert result["logz_bridge"] is not None
    assert abs(result["logz_bridge"]) < 0.5, result["logz_bridge"]
    assert result["logz_err_bridge"] is not None
    chosen = {"ps": result["logz_ps"], "is": result["logz_is"],
              "bridge": result["logz_bridge"]}
    assert result["logz"] == chosen[result["logz_source"]]


def test_fit_flow_rejects_zero_steps_and_dynamic_clamps():
    """fit_flow(steps=0) used to crash on an empty scan and
    fit_flow_dynamic(0) returned the large-finite sentinel as the 'loss'
    (round-4 review finding): the static API now rejects it loudly and
    the traced budget clamps to one step."""
    from gpbayestools_hic_tpu.samplers.flows import (
        FlowConfig, fit_flow, fit_flow_dynamic, init_flow,
    )

    cfg = FlowConfig(n_layers=2, hidden=8)
    u = jnp.asarray(np.random.default_rng(0).normal(size=(32, 2)))
    w = jnp.ones(32)
    params = init_flow(jax.random.PRNGKey(0), 2, cfg, u.dtype)
    with pytest.raises(ValueError, match="steps"):
        fit_flow(params, u, w, jax.random.PRNGKey(1), config=cfg, steps=0)
    _, loss = fit_flow_dynamic(params, u, w, 0, config=cfg)
    assert np.isfinite(float(loss)) and abs(float(loss)) < 1e30, loss
