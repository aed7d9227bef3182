"""Preconditioned HMC sampler (beyond-reference; samplers/hmc.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import stats

from gpbayestools_hic_tpu.samplers import run_hmc
from gpbayestools_hic_tpu.utils.metrics import effective_sample_size


def test_hmc_ks_against_analytic_gaussian():
    """Unbounded target: KS test of the marginal against the exact law,
    on a correlated anisotropic Gaussian (exercises the dense metric)."""
    cov = np.array([[1.0, 0.8], [0.8, 2.0]])
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float64)
    mean = jnp.asarray([0.5, -1.0], jnp.float64)

    def log_prob(state, x):
        d = x - mean
        return -0.5 * jnp.einsum("bi,ij,bj->b", d, prec, d)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (64, 2), jnp.float64) * 0.2
    res = run_hmc(log_prob, x0, 500, jax.random.PRNGKey(1), state=(),
                  n_leapfrog=6, warmup=128)
    acc = float(np.mean(np.asarray(res.acceptance)))
    assert 0.6 < acc <= 1.0, acc
    samples = np.asarray(res.chain).reshape(-1, 2)
    for d in range(2):
        _, p = stats.kstest(
            samples[::7, d], "norm",
            args=(float(mean[d]), np.sqrt(cov[d, d])),
        )
        assert p > 1e-3, (d, p)


def test_hmc_bounded_box_matches_truncated_target():
    """Bounded (logit) mode: posterior mass stays in the box and matches a
    near-boundary Gaussian truncated to it."""
    lo = np.zeros(2)
    hi = np.ones(2)
    mu, sd = 0.85, 0.15  # significant mass beyond the upper bound

    def log_prob(state, x):
        return -0.5 * jnp.sum(((x - mu) / sd) ** 2, axis=-1)

    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(0.3, 0.7, (64, 2)), jnp.float64
    )
    res = run_hmc(log_prob, x0, 600, jax.random.PRNGKey(2), state=(),
                  lo=lo, hi=hi, n_leapfrog=6, warmup=128)
    samples = np.asarray(res.chain).reshape(-1, 2)
    assert samples.min() >= 0.0 and samples.max() <= 1.0
    a, b = (0 - mu) / sd, (1 - mu) / sd
    truth_mean = stats.truncnorm.mean(a, b, loc=mu, scale=sd)
    truth_sd = stats.truncnorm.std(a, b, loc=mu, scale=sd)
    assert np.allclose(samples.mean(0), truth_mean, atol=0.02), (
        samples.mean(0), truth_mean)
    assert np.allclose(samples.std(0), truth_sd, atol=0.02), (
        samples.std(0), truth_sd)


def test_hmc_near_iid_mixing():
    """The headline property: tau ~ 1 on a well-conditioned target (the
    flagship TPU measurement saw tau 1.7 vs ~40+ for the ensemble moves)."""
    def log_prob(state, x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    x0 = jax.random.normal(jax.random.PRNGKey(3), (32, 3), jnp.float64)
    res = run_hmc(log_prob, x0, 400, jax.random.PRNGKey(4), state=(),
                  n_leapfrog=6, warmup=96)
    chain = np.asarray(res.chain)
    ess = effective_sample_size(chain)
    # threshold accounts for the default trajectory-length jitter (lengths
    # {5, 6} here): tau ~ 4 instead of the fixed-L ~3 on this small target
    assert ess > 0.2 * chain.shape[0] * chain.shape[1], ess


def test_hmc_traj_jitter_breaks_resonance():
    """Resonance regression: on a standard Gaussian a FIXED trajectory with
    eps * L ~ 2 pi is (near-)periodic -- every proposal returns close to its
    start and tau spikes.  Randomizing the per-walker trajectory length
    (traj_jitter > 0) must break the resonance (much smaller tau)."""
    from gpbayestools_hic_tpu.samplers.hmc import _hmc_scan
    from gpbayestools_hic_tpu.utils.metrics import integrated_autocorr_time

    def log_prob(state, x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    n_leapfrog = 8
    eps = 2.0 * np.pi / n_leapfrog  # resonant total time ~ 2 pi
    tf = {
        "mu": jnp.zeros(1, jnp.float64),
        "chol": jnp.eye(1, dtype=jnp.float64),
        "lo": jnp.zeros((), jnp.float64),
        "width": jnp.zeros((), jnp.float64),
    }
    u0 = jax.random.normal(jax.random.PRNGKey(0), (64, 1), jnp.float64)

    def tau_of(jitter):
        xs, _, _, _, _ = _hmc_scan(
            log_prob, (), tf, u0, jax.random.PRNGKey(1),
            jnp.asarray(np.log(eps)),
            nsteps=1500, n_leapfrog=n_leapfrog, adapt=False, bounded=False,
            traj_jitter=jitter,
        )
        chain = np.transpose(np.asarray(xs), (1, 0, 2))  # (walkers, steps, 1)
        return integrated_autocorr_time(
            chain[:, :, 0], return_converged=True
        )[0]

    tau_fixed = tau_of(0)
    tau_jit = tau_of(2)
    assert tau_fixed > 2.5 * tau_jit, (tau_fixed, tau_jit)
    assert tau_jit < 8.0, tau_jit


def test_hmc_traj_jitter_clamped_to_positive_lengths():
    """traj_jitter >= n_leapfrog must not draw zero-length trajectories
    (those would freeze walkers while the MH test runs on a bogus energy
    difference from the initial half-kick)."""
    def log_prob(state, x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    x0 = jax.random.normal(jax.random.PRNGKey(7), (32, 2), jnp.float64)
    res = run_hmc(log_prob, x0, 200, jax.random.PRNGKey(8), state=(),
                  n_leapfrog=1, traj_jitter=1, warmup=32)
    chain = np.asarray(res.chain)
    # fraction of exactly-frozen steps should reflect MH rejections only
    # (acceptance is adapted toward 0.8), not ~50% zero-length proposals
    frozen = np.mean(np.all(chain[:, 1:] == chain[:, :-1], axis=-1))
    assert frozen < 0.4, frozen


def _ar1_probe_chain(rng, nsteps, nwalkers, ndim, l_max, rho_of_group):
    """Synthesize a rotating stratified probe chain: the transition into
    us[t] runs walker w at length 1 + ((w + t) mod l_max), with the
    length's per-coordinate rho (mirrors _hmc_scan's probe schedule)."""
    us = np.empty((nsteps, nwalkers, ndim))
    us[0] = rng.standard_normal((nwalkers, ndim))
    for t in range(1, nsteps):
        rho = np.stack(
            [rho_of_group(1 + (w + t) % l_max) for w in range(nwalkers)]
        )
        innov = np.sqrt(1.0 - rho**2)
        us[t] = rho * us[t - 1] + innov * rng.standard_normal((nwalkers, ndim))
    return us


def test_select_leapfrog_maximizes_ar1_mixing_per_gradient():
    """Unit test of the auto-L criterion on synthetic AR(1) sub-chains:
    the selector must pick the length whose (1-rho)/((1+rho)L) score --
    effective samples per gradient, worst coordinate -- is largest."""
    from gpbayestools_hic_tpu.samplers.hmc import _select_leapfrog

    rng = np.random.default_rng(0)
    # every group mixes slowly (rho=0.9) except L=5 (white noise): the
    # scores are 0.2 at L=5 vs <= (0.1/1.9)/L ~ 0.053 elsewhere
    us = _ar1_probe_chain(
        rng, 512, 32, 2, 8,
        lambda L: np.array([0.9, 0.9]) if L != 5 else np.zeros(2),
    )
    assert _select_leapfrog(us, 8) == 5

    # the worst COORDINATE scores the group: L=5 has one fast and one slow
    # coordinate, so white-noise L=2 (score 1/2) must win over it
    us = _ar1_probe_chain(
        rng, 512, 32, 2, 8,
        lambda L: {5: np.array([0.0, 0.9]), 2: np.zeros(2)}.get(
            L, np.array([0.9, 0.9])
        ),
    )
    assert _select_leapfrog(us, 8) == 2

    # identical mixing everywhere -> the 1/L gradient-cost penalty picks 1
    us = _ar1_probe_chain(rng, 512, 32, 2, 8, lambda L: np.zeros(2))
    assert _select_leapfrog(us, 8) == 1

    # starved groups (< 8 lag pairs each) fall back to the mid-range length
    assert _select_leapfrog(us[:2, :4], 8) == 4


def test_hmc_auto_leapfrog_calibrates_and_samples_correctly():
    """n_leapfrog='auto': the probe picks a length in range, reports it on
    the result, and the production samples still match the target law."""
    cov = np.array([[1.0, 0.8], [0.8, 2.0]])
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float64)

    def log_prob(state, x):
        return -0.5 * jnp.einsum("bi,ij,bj->b", x, prec, x)

    x0 = jax.random.normal(jax.random.PRNGKey(9), (64, 2), jnp.float64) * 0.2
    res = run_hmc(log_prob, x0, 400, jax.random.PRNGKey(10), state=(),
                  n_leapfrog="auto", l_max=8, probe_steps=24, warmup=96)
    assert 1 <= res.n_leapfrog <= 8
    samples = np.asarray(res.chain).reshape(-1, 2)
    assert np.allclose(samples.mean(0), 0.0, atol=0.1)
    assert np.allclose(samples.std(0), np.sqrt(np.diag(cov)), rtol=0.12)

    with pytest.raises(ValueError, match="auto"):
        run_hmc(log_prob, x0, 4, jax.random.PRNGKey(0), state=(),
                n_leapfrog="nuts")


def test_hmc_auto_warmup_terminates_and_samples_correctly(monkeypatch):
    """warmup='auto': adaptation runs in compiled 16-step chunks and stops
    itself once the dual-averaged step size stabilizes on target acceptance
    -- no hand-picked warmup count -- and sampling is still correct."""
    import gpbayestools_hic_tpu.samplers.hmc as hmc_mod

    cov = np.array([[1.0, 0.8], [0.8, 2.0]])
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float64)

    def log_prob(state, x):
        return -0.5 * jnp.einsum("bi,ij,bj->b", x, prec, x)

    calls = []
    real_scan = hmc_mod._hmc_scan

    def counting_scan(*a, **kw):
        calls.append(kw.get("nsteps"))
        return real_scan(*a, **kw)

    monkeypatch.setattr(hmc_mod, "_hmc_scan", counting_scan)
    x0 = jax.random.normal(jax.random.PRNGKey(20), (64, 2), jnp.float64) * 0.2
    res = run_hmc(log_prob, x0, 400, jax.random.PRNGKey(21), state=(),
                  n_leapfrog=6, warmup="auto")
    # every adaptation call is one chunk; production is the single long scan
    warm_calls = [n for n in calls if n == hmc_mod._WARMUP_CHUNK]
    assert calls[-1] == 400
    assert len(warm_calls) == len(calls) - 1
    # two phases, each >= the minimum and < the hard cap (the stopping rule
    # must actually fire on this easy target)
    assert 2 * hmc_mod._WARMUP_MIN_CHUNKS <= len(warm_calls), calls
    assert len(warm_calls) < 2 * hmc_mod._WARMUP_MAX_CHUNKS, calls
    # the result reports exactly the adaptation steps that actually ran
    assert res.warmup_steps == len(warm_calls) * hmc_mod._WARMUP_CHUNK
    acc = float(np.mean(np.asarray(res.acceptance)))
    assert 0.6 < acc <= 1.0, acc
    samples = np.asarray(res.chain).reshape(-1, 2)
    assert np.allclose(samples.mean(0), 0.0, atol=0.1)
    assert np.allclose(samples.std(0), np.sqrt(np.diag(cov)), rtol=0.15)

    with pytest.raises(ValueError, match="warmup"):
        run_hmc(log_prob, x0, 4, jax.random.PRNGKey(0), state=(),
                warmup="fast")


def test_hmc_warm_start_skips_adaptation(monkeypatch):
    """warm_start reuses a previous run's metric/step size/length, runs
    ONLY the production phase, and still samples the target correctly."""
    import gpbayestools_hic_tpu.samplers.hmc as hmc_mod

    cov = np.array([[1.0, 0.8], [0.8, 2.0]])
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float64)

    def log_prob(state, x):
        return -0.5 * jnp.einsum("bi,ij,bj->b", x, prec, x)

    x0 = jax.random.normal(jax.random.PRNGKey(11), (64, 2), jnp.float64) * 0.2
    res = run_hmc(log_prob, x0, 300, jax.random.PRNGKey(12), state=(),
                  n_leapfrog=6, warmup=96)
    assert res.warmup_steps == 2 * 96  # fixed warmup: both phases reported

    calls = []
    real_scan = hmc_mod._hmc_scan

    def counting_scan(*a, **kw):
        calls.append(kw.get("nsteps"))
        return real_scan(*a, **kw)

    monkeypatch.setattr(hmc_mod, "_hmc_scan", counting_scan)
    res2 = run_hmc(log_prob, res.final_state, 300, jax.random.PRNGKey(13),
                   state=(), n_leapfrog=6, warmup=96, warm_start=res)
    assert calls == [300]  # production only: no adaptation phases
    assert res2.warmup_steps == 0  # warm start reports zero adaptation
    # (log -> exp roundtrip: equal to float rounding, not bitwise)
    np.testing.assert_allclose(res2.step_size, res.step_size, rtol=1e-12)
    np.testing.assert_array_equal(res2.precond_chol, res.precond_chol)
    np.testing.assert_array_equal(res2.precond_mu, res.precond_mu)
    samples = np.asarray(res2.chain).reshape(-1, 2)
    assert np.allclose(samples.mean(0), 0.0, atol=0.1)
    assert np.allclose(samples.std(0), np.sqrt(np.diag(cov)), rtol=0.15)
    # the continuation must not replay the donor run's randomness
    assert not np.array_equal(np.asarray(res2.chain), np.asarray(res.chain))

    # n_leapfrog='auto' + warm_start reuses the calibrated length with no
    # probe phase (still a single production scan)
    calls.clear()
    res3 = run_hmc(log_prob, res.final_state, 100, jax.random.PRNGKey(14),
                   state=(), n_leapfrog="auto", warmup=96, warm_start=res)
    assert calls == [100]
    assert res3.n_leapfrog == res.n_leapfrog

    with pytest.raises(ValueError, match="ndim"):
        run_hmc(log_prob, jnp.zeros((8, 3)), 4, jax.random.PRNGKey(0),
                state=(), warm_start=res)


@pytest.mark.slow
def test_hmc_deterministic_given_seed():
    def log_prob(state, x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    x0 = jax.random.normal(jax.random.PRNGKey(5), (16, 2), jnp.float64)
    r1 = run_hmc(log_prob, x0, 50, jax.random.PRNGKey(6), state=(), warmup=32)
    r2 = run_hmc(log_prob, x0, 50, jax.random.PRNGKey(6), state=(), warmup=32)
    np.testing.assert_array_equal(np.asarray(r1.chain), np.asarray(r2.chain))
    assert r1.step_size == r2.step_size

    # state-free form: the cached adapter must give identical results (and a
    # stable jit key -- a fresh lambda per call would recompile every run)
    def log_prob_nostate(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    r3 = run_hmc(log_prob_nostate, x0, 50, jax.random.PRNGKey(6), warmup=32)
    np.testing.assert_array_equal(np.asarray(r1.chain), np.asarray(r3.chain))
    from gpbayestools_hic_tpu.samplers.hmc import _stateless_wrapper
    assert _stateless_wrapper(log_prob_nostate) is _stateless_wrapper(
        log_prob_nostate
    )


@pytest.mark.slow
def test_chain_run_hmc_contract(tmp_path):
    """Chain.run_MCMC_HMC writes the standard chain pickle and the samples
    agree with the ensemble sampler on the same posterior."""
    import pickle

    from gpbayestools_hic_tpu.models import Emulator
    from gpbayestools_hic_tpu.samplers import Chain

    rng = np.random.default_rng(11)
    ndim, nev, nobs = 2, 40, 8
    design = rng.uniform(0, 1, size=(nev, ndim))
    freqs = rng.uniform(1.5, 3.0, size=(ndim, nobs))
    base = 2.0 + np.sin(design @ freqs) + 0.5 * design @ freqs
    err = 0.01 * np.abs(base)
    with open(tmp_path / "t.pkl", "wb") as f:
        pickle.dump({
            str(i): {"parameter": design[i], "obs": np.stack([base[i], err[i]])}
            for i in range(nev)
        }, f)
    parfile = tmp_path / "p.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(ndim)))
    emu = Emulator(str(tmp_path / "t.pkl"), str(parfile), npc=3)
    emu.trainEmulatorAutoMask()
    truth = np.array([0.45, 0.55])
    exp_mean = 2.0 + np.sin(truth @ freqs) + 0.5 * truth @ freqs
    with open(tmp_path / "exp.pkl", "wb") as f:
        pickle.dump(
            {"0": {"obs": np.stack([exp_mean, 0.02 * np.abs(exp_mean)])}}, f
        )

    def make_chain(name):
        c = Chain(
            mcmc_path=str(tmp_path / "mcmc" / name),
            expdata_path=str(tmp_path / "exp.pkl"),
            model_parafile=str(parfile),
        )
        c.loadEmulator([emu])
        return c

    ch = make_chain("hmc.pkl")
    res = ch.run_MCMC_HMC(nsteps=200, nwalkers=32, nburnsteps=64,
                          n_leapfrog=6, seed=0)
    with open(tmp_path / "mcmc" / "hmc.pkl", "rb") as f:
        data = pickle.load(f)
    assert data["chain"].shape == (32, 200, ndim)
    assert res.step_size > 0

    # resume-by-append with a warm start: same contract as run_mcmc's
    # reference resume, zero adaptation phases re-run
    ch.run_MCMC_HMC(nsteps=50, nwalkers=32, nburnsteps=64, n_leapfrog=6,
                    seed=0, resume=True, warm_start=res)
    with open(tmp_path / "mcmc" / "hmc.pkl", "rb") as f:
        data2 = pickle.load(f)
    assert data2["chain"].shape == (32, 250, ndim)
    np.testing.assert_array_equal(data2["chain"][:, :200], data["chain"])
    # the appended segment must not replay the fresh run's randomness
    # (the chain length is folded into the resumed production key)
    assert not np.array_equal(
        data2["chain"][:, 200:250], data["chain"][:, :50]
    )

    # warm_start with NO chain pickle: walkers must continue from the warm
    # state's final positions (adaptation and burn-in are both skipped, so
    # fresh prior draws would be written as unconverged production samples)
    cw = make_chain("hmc_warm_only.pkl")
    res_w = cw.run_MCMC_HMC(nsteps=20, nwalkers=64, seed=0, resume=True,
                            warm_start=res)
    with open(tmp_path / "mcmc" / "hmc_warm_only.pkl", "rb") as f:
        warm_only = pickle.load(f)["chain"]
    # warm_start.final_state's walker count (32) wins over nwalkers=64
    assert warm_only.shape == (32, 20, ndim)
    first_step_dist = np.linalg.norm(
        warm_only[:, 0, :] - np.asarray(res.final_state), axis=1
    )
    # one HMC step from final_state, not a prior re-draw
    assert np.median(first_step_dist) < 0.5 * np.sqrt(ndim)
    assert res_w.step_size == res.step_size
    # the default n_leapfrog=None INHERITS the warm start's calibrated
    # trajectory length (res ran with n_leapfrog=6) instead of silently
    # overriding it with the fresh-run default of 8
    assert res_w.n_leapfrog == res.n_leapfrog == 6

    # scheme/window pass through the Chain front-end: an oversized window
    # must raise BEFORE any warmup gradients are spent ...
    cv = make_chain("win_bad.pkl")
    with pytest.raises(ValueError, match="window"):
        cv.run_MCMC_HMC(nsteps=10, nwalkers=8, nburnsteps=16, n_leapfrog=4,
                        scheme="windowed", window=3)
    # ... and a valid windowed run writes the same pickle contract
    cwin = make_chain("win.pkl")
    cwin.run_MCMC_HMC(nsteps=30, nwalkers=16, nburnsteps=32, n_leapfrog=6,
                      seed=0, scheme="windowed", window=2)
    with open(tmp_path / "mcmc" / "win.pkl", "rb") as f:
        assert pickle.load(f)["chain"].shape == (16, 30, ndim)

    # resuming over a flat 2-D chain (run_pocoMC's contract) is a clean error
    cf = make_chain("flat.pkl")
    with open(tmp_path / "mcmc" / "flat.pkl", "wb") as f:
        pickle.dump({"chain": np.zeros((100, ndim))}, f)
    with pytest.raises(ValueError, match="walker-chain contract"):
        cf.run_MCMC_HMC(nsteps=10, nwalkers=8, resume=True)
    # ... and run_mcmc gives the same informative error (not a cryptic
    # too-many-indices crash) for the same misuse
    with pytest.raises(ValueError, match="walker-chain contract"):
        cf.run_mcmc(nsteps=10, nburnsteps=10, nwalkers=8)

    ce = make_chain("ens.pkl")
    ce.run_mcmc(nsteps=400, nburnsteps=400, nwalkers=32, nthin=2, seed=0,
                move="de")
    hmc_flat = data["chain"].reshape(-1, ndim)
    ens_flat = ce.chain[:, 50:, :].reshape(-1, ndim)
    width = np.maximum(hmc_flat.std(0), ens_flat.std(0))
    assert np.all(np.abs(hmc_flat.mean(0) - ens_flat.mean(0)) < 3 * width)
    ratio = hmc_flat.std(0) / ens_flat.std(0)
    assert np.all(ratio < 3) and np.all(ratio > 1 / 3), ratio


def test_warm_fallback_key_distinct_per_continuation():
    """Chained warm-start continuations (no chain pickle) with the SAME
    seed must not replay one random stream: the key folds in the warm
    start's final-state fingerprint, so distinct final states give distinct
    streams while the same (seed, state) pair stays reproducible."""
    from gpbayestools_hic_tpu.samplers.chain import _warm_fallback_key

    fs1 = np.random.default_rng(0).normal(size=(32, 4))
    fs2 = np.random.default_rng(1).normal(size=(32, 4))
    k1 = np.asarray(jax.random.key_data(_warm_fallback_key(0, fs1)))
    k2 = np.asarray(jax.random.key_data(_warm_fallback_key(0, fs2)))
    k1_again = np.asarray(jax.random.key_data(_warm_fallback_key(0, fs1)))
    assert not np.array_equal(k1, k2)
    np.testing.assert_array_equal(k1, k1_again)
    # seed still matters for a fixed state
    k1_seed7 = np.asarray(jax.random.key_data(_warm_fallback_key(7, fs1)))
    assert not np.array_equal(k1, k1_seed7)


def test_run_hmc_rejects_nonpositive_warmup():
    """warmup=0 used to produce an empty metric-estimation window and die
    in an unrelated Cholesky error; it must raise a targeted ValueError
    (warm_start= is the supported way to skip adaptation)."""
    with pytest.raises(ValueError, match="warmup must be >= 1"):
        run_hmc(
            lambda s, x: -jnp.sum(x**2, axis=1), jnp.zeros((4, 2)), 8,
            jax.random.PRNGKey(0), warmup=0,
        )


# ------------------------------------------------- multinomial trajectory


def test_hmc_multinomial_matches_truncated_target():
    """scheme="multinomial" (uniform-shift static trajectory, Boltzmann
    state selection) must target the same distribution as the Metropolis
    endpoint scheme: moments of a near-boundary truncated Gaussian."""
    lo = np.zeros(2)
    hi = np.ones(2)
    mu, sd = 0.85, 0.15

    def log_prob(state, x):
        return -0.5 * jnp.sum(((x - mu) / sd) ** 2, axis=-1)

    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(0.3, 0.7, (64, 2)), jnp.float64
    )
    res = run_hmc(log_prob, x0, 600, jax.random.PRNGKey(2), state=(),
                  lo=lo, hi=hi, n_leapfrog=6, warmup=128,
                  scheme="multinomial")
    samples = np.asarray(res.chain).reshape(-1, 2)
    assert samples.min() >= 0.0 and samples.max() <= 1.0
    from scipy import stats as sps
    a, b = (0 - mu) / sd, (1 - mu) / sd
    truth_mean = sps.truncnorm.mean(a, b, loc=mu, scale=sd)
    truth_sd = sps.truncnorm.std(a, b, loc=mu, scale=sd)
    assert np.allclose(samples.mean(0), truth_mean, atol=0.02), (
        samples.mean(0), truth_mean)
    assert np.allclose(samples.std(0), truth_sd, atol=0.02), (
        samples.std(0), truth_sd)
    # accept_stat is the trajectory-averaged min(1, exp(dH)): a healthy
    # adapted run sits well above zero and at/below 1
    acc = float(np.mean(np.asarray(res.acceptance)))
    assert 0.3 < acc <= 1.0, acc


def test_hmc_multinomial_ks_against_analytic_gaussian():
    """Unbounded + correlated target under the multinomial scheme: KS test
    per marginal (detects both bias and wrong variance, unlike moments)."""
    from scipy import stats as sps

    cov = np.array([[1.0, 0.8], [0.8, 2.0]])
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float64)
    mean = jnp.asarray([0.5, -1.0], jnp.float64)

    def log_prob(state, x):
        d = x - mean
        return -0.5 * jnp.einsum("bi,ij,bj->b", d, prec, d)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (64, 2), jnp.float64) * 0.2
    res = run_hmc(log_prob, x0, 500, jax.random.PRNGKey(1), state=(),
                  n_leapfrog=6, warmup=128, scheme="multinomial")
    samples = np.asarray(res.chain).reshape(-1, 2)
    for d in range(2):
        _, p = sps.kstest(
            samples[::7, d], "norm",
            args=(float(mean[d]), np.sqrt(cov[d, d])),
        )
        assert p > 1e-3, (d, p)


def test_hmc_scheme_auto_picks_windowed_at_high_acceptance():
    """scheme="auto" on a well-conditioned target (adapted acceptance ~0.8)
    must resolve to the measured-best windowed + persistent-momentum
    kernel, report the resolved branch, and still sample the right law."""
    def log_prob(state, x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (48, 2), jnp.float64)
    res = run_hmc(log_prob, x0, 400, jax.random.PRNGKey(1), state=(),
                  n_leapfrog=6, warmup=96, scheme="auto")
    assert res.scheme == "windowed"
    assert res.persist == pytest.approx(0.7)
    samples = np.asarray(res.chain).reshape(-1, 2)
    assert np.abs(samples.mean(0)).max() < 0.08
    assert np.abs(samples.std(0) - 1.0).max() < 0.08
    # an explicit nonzero persist wins over the 0.7 default
    res2 = run_hmc(log_prob, x0, 30, jax.random.PRNGKey(2), state=(),
                   n_leapfrog=6, warmup=64, scheme="auto", persist=0.4)
    assert res2.scheme == "windowed" and res2.persist == pytest.approx(0.4)


def test_hmc_scheme_auto_falls_back_to_mh_at_low_acceptance():
    """With the step size adapted toward a low acceptance target (< 0.75),
    persistence cannot pay (rejections flip the momentum): auto must fall
    back to the endpoint-Metropolis kernel with no persistence."""
    def log_prob(state, x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    x0 = jax.random.normal(jax.random.PRNGKey(3), (48, 2), jnp.float64)
    res = run_hmc(log_prob, x0, 60, jax.random.PRNGKey(4), state=(),
                  n_leapfrog=6, warmup=96, scheme="auto", target_accept=0.55)
    assert res.scheme == "mh"
    assert res.persist == 0.0


def test_hmc_scheme_auto_warm_start_uses_previous_acceptance():
    """A warm start runs no adaptation; auto keys off the previous run's
    production acceptance instead (windowed acceptance ~0.9 here)."""
    def log_prob(state, x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    x0 = jax.random.normal(jax.random.PRNGKey(5), (32, 2), jnp.float64)
    first = run_hmc(log_prob, x0, 100, jax.random.PRNGKey(6), state=(),
                    n_leapfrog=6, warmup=96, scheme="auto")
    res = run_hmc(log_prob, first.final_state, 30, jax.random.PRNGKey(7),
                  state=(), n_leapfrog=6, scheme="auto", warm_start=first)
    assert res.warmup_steps == 0
    assert res.scheme == ("windowed" if float(np.mean(np.asarray(
        first.acceptance))) >= 0.75 else "mh")


def test_hmc_scheme_auto_validates_explicit_window_early():
    """An explicit nonsense window under scheme='auto' must fail BEFORE
    the adaptation phases run (round-5 review: it previously burned both
    warmup phases first, or was silently ignored when auto fell back to
    MH)."""
    def log_prob(state, x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (8, 2), jnp.float64)
    with pytest.raises(ValueError, match="window"):
        run_hmc(log_prob, x0, 4, jax.random.PRNGKey(1), state=(),
                n_leapfrog=4, warmup=4, scheme="auto", window=5)


def test_hmc_unknown_scheme_raises():
    with pytest.raises(ValueError, match="scheme must be"):
        run_hmc(
            lambda s, x: -jnp.sum(x**2, axis=1), jnp.zeros((4, 2)), 8,
            jax.random.PRNGKey(0), warmup=16, scheme="nuts",
        )


def test_hmc_windowed_matches_truncated_target():
    """scheme="windowed" (Neal 1994): window-sum accept/reject + Boltzmann
    selection within the chosen window must target the same truncated
    Gaussian, with near-iid mixing (the CPU measurement that motivated it:
    tau 1.0 vs 4.3 for the endpoint-Metropolis scheme on this target)."""
    from scipy import stats as sps

    lo = np.zeros(2)
    hi = np.ones(2)
    mu, sd = 0.85, 0.15

    def log_prob(state, x):
        return -0.5 * jnp.sum(((x - mu) / sd) ** 2, axis=-1)

    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(0.3, 0.7, (64, 2)), jnp.float64
    )
    res = run_hmc(log_prob, x0, 800, jax.random.PRNGKey(2), state=(),
                  lo=lo, hi=hi, n_leapfrog=6, warmup=128, scheme="windowed")
    samples = np.asarray(res.chain).reshape(-1, 2)
    assert samples.min() >= 0.0 and samples.max() <= 1.0
    a, b = (0 - mu) / sd, (1 - mu) / sd
    truth_mean = sps.truncnorm.mean(a, b, loc=mu, scale=sd)
    truth_sd = sps.truncnorm.std(a, b, loc=mu, scale=sd)
    assert np.allclose(samples.mean(0), truth_mean, atol=0.01), (
        samples.mean(0), truth_mean)
    assert np.allclose(samples.std(0), truth_sd, atol=0.01), (
        samples.std(0), truth_sd)
    ess = effective_sample_size(np.asarray(res.chain))
    # near-iid: wide margin below the measured tau ~ 1
    assert ess > 0.5 * samples.shape[0], ess


def test_hmc_windowed_ks_against_analytic_gaussian():
    from scipy import stats as sps

    cov = np.array([[1.0, 0.8], [0.8, 2.0]])
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float64)
    mean = jnp.asarray([0.5, -1.0], jnp.float64)

    def log_prob(state, x):
        d = x - mean
        return -0.5 * jnp.einsum("bi,ij,bj->b", d, prec, d)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (64, 2), jnp.float64) * 0.2
    res = run_hmc(log_prob, x0, 500, jax.random.PRNGKey(1), state=(),
                  n_leapfrog=6, warmup=128, scheme="windowed")
    samples = np.asarray(res.chain).reshape(-1, 2)
    for d in range(2):
        _, p = sps.kstest(
            samples[::7, d], "norm",
            args=(float(mean[d]), np.sqrt(cov[d, d])),
        )
        assert p > 1e-3, (d, p)


@pytest.mark.slow
def test_hmc_windowed_persistent_matches_truncated_target():
    """Partial momentum refresh (persist=0.9, Horowitz generalized HMC on
    top of the windowed scheme) must leave the target invariant: the
    reject-window momentum flip is what detailed balance hinges on, so a
    sign error here shows up as biased moments, not a crash."""
    from scipy import stats as sps

    lo = np.zeros(2)
    hi = np.ones(2)
    mu, sd = 0.85, 0.15

    def log_prob(state, x):
        return -0.5 * jnp.sum(((x - mu) / sd) ** 2, axis=-1)

    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(0.3, 0.7, (64, 2)), jnp.float64
    )
    res = run_hmc(log_prob, x0, 1000, jax.random.PRNGKey(2), state=(),
                  lo=lo, hi=hi, n_leapfrog=6, warmup=128,
                  scheme="windowed", persist=0.9)
    samples = np.asarray(res.chain)[:, 200:, :].reshape(-1, 2)
    assert samples.min() >= 0.0 and samples.max() <= 1.0
    a, b = (0 - mu) / sd, (1 - mu) / sd
    truth_mean = sps.truncnorm.mean(a, b, loc=mu, scale=sd)
    truth_sd = sps.truncnorm.std(a, b, loc=mu, scale=sd)
    assert np.allclose(samples.mean(0), truth_mean, atol=0.01), (
        samples.mean(0), truth_mean)
    assert np.allclose(samples.std(0), truth_sd, atol=0.01), (
        samples.std(0), truth_sd)


def test_hmc_persist_validation():
    """persist outside [0, 1) and persist on a non-windowed scheme both
    raise before any gradients are spent."""
    f = lambda x: -jnp.sum(x**2, axis=1)
    with pytest.raises(ValueError, match="persist"):
        run_hmc(f, jnp.zeros((4, 2)), 8, jax.random.PRNGKey(0),
                warmup=16, scheme="windowed", persist=1.0)
    with pytest.raises(ValueError, match="persist"):
        run_hmc(f, jnp.zeros((4, 2)), 8, jax.random.PRNGKey(0),
                warmup=16, scheme="mh", persist=0.5)


def test_hmc_windowed_window_validation():
    """2 * window must not exceed n_leapfrog + 1 (disjoint windows), and
    the check fires BEFORE warmup runs (a bad window must not cost two
    adaptation phases first)."""
    with pytest.raises(ValueError, match="window"):
        run_hmc(
            lambda x: -jnp.sum(x**2, axis=1), jnp.zeros((4, 2)), 8,
            jax.random.PRNGKey(0), warmup=16, n_leapfrog=4,
            scheme="windowed", window=3,
        )


def test_warmup_walkers_full_subset_is_identical():
    """warmup_walkers=nwalkers must be byte-identical to the default path
    (the tiling expansion is a no-op there)."""
    def log_prob(state, x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (32, 3), jnp.float64) * 0.3
    kw = dict(state=(), n_leapfrog=4, warmup=32)
    r_def = run_hmc(log_prob, x0, 40, jax.random.PRNGKey(1), **kw)
    r_sub = run_hmc(log_prob, x0, 40, jax.random.PRNGKey(1),
                    warmup_walkers=32, **kw)
    np.testing.assert_array_equal(np.asarray(r_def.chain),
                                  np.asarray(r_sub.chain))
    assert r_def.step_size == r_sub.step_size


def test_warmup_walkers_subset_samples_correctly():
    """Adaptation on a quarter of the walkers, production on all: the
    bounded target's truncated moments must still come out right, and the
    tiled duplicate starts must decorrelate (distinct production chains)."""
    lo_b = np.zeros(2)
    hi_b = np.ones(2)
    mu, sd = 0.6, 0.2

    def log_prob(state, x):
        return -0.5 * jnp.sum(((x - mu) / sd) ** 2, axis=-1)

    x0 = jnp.asarray(
        np.random.default_rng(3).uniform(0.3, 0.7, (64, 2)), jnp.float64
    )
    res = run_hmc(log_prob, x0, 500, jax.random.PRNGKey(4), state=(),
                  lo=lo_b, hi=hi_b, n_leapfrog=6, warmup=96,
                  warmup_walkers=16, scheme="windowed", persist=0.7)
    samples = np.asarray(res.chain)
    assert samples.min() >= 0.0 and samples.max() <= 1.0
    a, b = (0 - mu) / sd, (1 - mu) / sd
    flat = samples[:, 100:, :].reshape(-1, 2)
    assert np.allclose(flat.mean(0), stats.truncnorm.mean(a, b, mu, sd),
                       atol=0.02)
    assert np.allclose(flat.std(0), stats.truncnorm.std(a, b, mu, sd),
                       atol=0.02)
    # walkers 0 and 16 start from the SAME warmed point (tiling) but must
    # diverge immediately (per-walker RNG lanes)
    assert not np.array_equal(samples[0], samples[16])


def test_warmup_walkers_validation():
    def log_prob(state, x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    x0 = jnp.zeros((8, 2))
    for bad in (0, -1, 9):
        with pytest.raises(ValueError, match="warmup_walkers"):
            run_hmc(log_prob, x0, 4, jax.random.PRNGKey(0), state=(),
                    warmup_walkers=bad, warmup=4)
