"""Sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpbayestools_hic_tpu.parallel import make_mesh, shard_batch, sharded_log_prob


pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def test_mesh_and_shard_batch():
    mesh = make_mesh(8)
    x = jnp.arange(32.0 * 3).reshape(32, 3)
    xs = shard_batch(mesh, x)
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_sharded_log_prob_matches_unsharded():
    mesh = make_mesh(8)
    state = {"mu": jnp.asarray([0.3, 0.7]), "w": jnp.eye(2) * 2.0}

    def log_prob(s, x):
        d = x - s["mu"]
        return -0.5 * jnp.einsum("bi,ij,bj->b", d, s["w"], d)

    x = jax.random.uniform(jax.random.PRNGKey(0), (40, 2))
    expected = log_prob(state, x)
    xs = shard_batch(mesh, x)
    f = sharded_log_prob(log_prob, mesh, state=state)
    got = f(xs)
    assert len(got.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-12)


def test_sharded_ensemble_step_matches_single_device():
    """One stretch-move step gives identical results sharded vs not."""
    from gpbayestools_hic_tpu.samplers.ensemble import run_ensemble

    mesh = make_mesh(8)
    state = {"mu": jnp.asarray([0.2, 0.8, 0.5])}

    def log_prob(s, x):
        return -0.5 * jnp.sum((x - s["mu"]) ** 2, axis=-1)

    x0 = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    r_plain = run_ensemble(log_prob, x0, 5, jax.random.PRNGKey(2), state=state)
    r_shard = run_ensemble(
        log_prob, shard_batch(mesh, x0), 5, jax.random.PRNGKey(2), state=state
    )
    np.testing.assert_allclose(
        np.asarray(r_plain.final_state), np.asarray(r_shard.final_state),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(r_plain.chain), np.asarray(r_shard.chain), rtol=1e-6
    )


def test_sharded_ptlmc_scan_matches_single_device():
    """The PTLMC main loop gives identical chains with the chain axis
    sharded over the mesh (swaps become XLA collectives)."""
    from gpbayestools_hic_tpu.samplers.ptlmc import (
        _ptlmc_scan,
        _temperature_ladder,
    )

    mesh = make_mesh(8)
    state = {"mu": jnp.asarray([0.4, 0.6])}

    def log_prob(s, x):
        return -0.5 * jnp.sum(((x - s["mu"]) / 0.1) ** 2, axis=-1)

    numtemps, numchain = 16, 16  # totnum = 32, divisible by 8
    dtype = jnp.float64
    temps = _temperature_ladder(numtemps, numchain, 30.0, dtype)
    thetac = jax.random.uniform(jax.random.PRNGKey(0), (32, 2), dtype)
    fval0 = log_prob(state, thetac) / temps
    hc = 0.05 * jnp.eye(2, dtype=dtype)
    tau0 = jnp.asarray(-1.0, dtype)
    rho0 = 2.0 * (1.0 + jnp.tanh(tau0))

    def run(theta_in, fval_in):
        return _ptlmc_scan(
            log_prob, state, theta_in, fval_in, temps, hc, tau0, rho0,
            jax.random.PRNGKey(1), jnp.eye(2, dtype=dtype),
            total_steps=12, samptunning=8, numtemps=numtemps,
            taracc=0.25, use_gradients=False,
        )

    plain = run(thetac, fval0)
    sharded = run(shard_batch(mesh, thetac), shard_batch(mesh, fval0))
    np.testing.assert_allclose(np.asarray(plain), np.asarray(sharded), rtol=1e-9)


@pytest.mark.slow
def test_sharded_smc_round_matches_single_device():
    """One adaptive tPCN MCMC round gives identical particles with the
    particle axis sharded over the mesh."""
    from gpbayestools_hic_tpu.samplers.flows import FlowConfig, init_flow
    from gpbayestools_hic_tpu.samplers.smc import (
        _eval_u,
        _mcmc_adaptive,
        _to_unbounded,
    )

    mesh = make_mesh(8)
    cfg = FlowConfig(n_layers=2, hidden=16)
    mu = jnp.asarray([0.4, 0.6])

    def logl(state, x, finite):
        return -0.5 * jnp.sum((x - mu) ** 2, axis=1) / 0.05**2

    lo, hi = jnp.zeros(2), jnp.ones(2)
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (32, 2), jnp.float64) * 0.6 + 0.2
    u0 = _to_unbounded(x0, lo, hi)
    log_prior_x = jnp.asarray(0.0)
    _, logl0, logp_u0, _ = _eval_u(logl, None, (), u0, lo, hi, log_prior_x)
    flow = init_flow(jax.random.PRNGKey(1), 2, cfg, jnp.float64)

    def run(u, lv, pv):
        out = _mcmc_adaptive(
            logl, None, (), flow, u, lv, pv,
            jnp.asarray(0.7), jnp.asarray(0.5), jnp.asarray(1e6),
            jax.random.PRNGKey(2), lo, hi, log_prior_x,
            jnp.asarray(10, jnp.int32), kernel="tpcn", config=cfg,
        )
        return out[0], out[1], out[5]

    u_p, logl_p, steps_p = run(u0, logl0, logp_u0)
    u_s, logl_s, steps_s = run(
        shard_batch(mesh, u0), shard_batch(mesh, logl0),
        shard_batch(mesh, logp_u0),
    )
    assert int(steps_p) == int(steps_s)
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_s), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(logl_p), np.asarray(logl_s), rtol=1e-9)


@pytest.fixture(scope="module")
def tiny_chain_factory(tmp_path_factory):
    """Small trained calibration problem for public-front-end mesh tests.

    Returns a factory making fresh Chain objects over the SAME trained
    emulators (so sharded and unsharded runs cannot interact through the
    chain pickle's resume-by-append contract)."""
    from gpbayestools_hic_tpu.utils.synthetic import build_synthetic_chain
    from gpbayestools_hic_tpu.samplers import Chain

    base = tmp_path_factory.mktemp("mesh_public")
    chain0, _ = build_synthetic_chain(
        nev=24, ndim=3, nobs_blocks=(6, 4), npc=2, gp_maxiter=15, seed=0,
        freq_range=(1.0, 2.5), tmpdir=str(base),
    )

    def make(tag):
        c = Chain(
            mcmc_path=str(base / f"mcmc_{tag}" / "chain.pkl"),
            expdata_path=str(base / "exp.pkl"),
            model_parafile=str(base / "pars.txt"),
        )
        c.loadEmulator(chain0.emuList)
        return c

    return make


@pytest.mark.slow
def test_public_run_mcmc_devices_matches_single(tiny_chain_factory):
    """Chain.run_mcmc(devices=8) == run_mcmc() through the PUBLIC API.

    Uses the resume path (a pre-seeded one-step chain pickle) so both runs
    start production from the SAME walkers: the burn-in resampling step
    dedups walkers by EXACT float equality of their log-posteriors
    (reference semantics, src/mcmc.py:392-397), which ULP-level
    sharded-reduction differences can flip — that is an artifact of the
    dedup, not of the sharded likelihood (whose per-segment chains are
    bit-identical, see the segment test above)."""
    import pickle

    kw = dict(nsteps=8, nburnsteps=4, nwalkers=16, nthin=2, seed=3,
              skip_initial_state_check=True)
    chains = {}
    for tag, extra in (("ens_plain", {}), ("ens_shard", {"devices": 8})):
        c = tiny_chain_factory(tag)
        x0 = c.random_pos(16, seed=7)[:, None, :]
        c.mcmc_path.parent.mkdir(parents=True, exist_ok=True)
        with open(c.mcmc_path, "wb") as f:
            pickle.dump({"chain": x0}, f)
        c.run_mcmc(**kw, **extra)
        chains[tag] = np.asarray(c.chain)
    np.testing.assert_allclose(
        chains["ens_shard"], chains["ens_plain"], rtol=1e-6, atol=1e-9,
    )


@pytest.mark.slow
def test_public_run_hmc_devices_matches_single(tiny_chain_factory):
    """Chain.run_MCMC_HMC(devices=8) == single-device, public API."""
    kw = dict(nsteps=6, nwalkers=16, nburnsteps=4, n_leapfrog=2, seed=5)
    c_plain = tiny_chain_factory("hmc_plain")
    c_plain.run_MCMC_HMC(**kw)
    c_shard = tiny_chain_factory("hmc_shard")
    c_shard.run_MCMC_HMC(devices=8, **kw)
    np.testing.assert_allclose(
        np.asarray(c_shard.chain), np.asarray(c_plain.chain), rtol=1e-6,
        atol=1e-9,
    )


@pytest.mark.slow
@pytest.mark.parametrize("persist", [0.0, 0.7])
def test_public_run_hmc_windowed_devices_matches_single(
    tiny_chain_factory, persist
):
    """The production bench scheme (windowed trajectory sampling, with and
    without persistent momentum) must give sharded == unsharded through the
    public front-end too: its window bookkeeping (Gumbel-max selection,
    window-sum accept) and the persistent-momentum carry run per walker,
    so device placement must not perturb the stream."""
    kw = dict(nsteps=6, nwalkers=16, nburnsteps=4, n_leapfrog=3, seed=5,
              scheme="windowed", window=2, persist=persist)
    c_plain = tiny_chain_factory(f"hmcw_plain{persist}")
    c_plain.run_MCMC_HMC(**kw)
    c_shard = tiny_chain_factory(f"hmcw_shard{persist}")
    c_shard.run_MCMC_HMC(devices=8, **kw)
    np.testing.assert_allclose(
        np.asarray(c_shard.chain), np.asarray(c_plain.chain), rtol=1e-6,
        atol=1e-9,
    )


@pytest.mark.slow
def test_public_run_ptlmc_devices_matches_single(tiny_chain_factory):
    """Chain.run_MCMC_PTLMC(devices=8) == single-device, public API."""
    kw = dict(nsteps=4, nwalkers=8, ntemps=8, maxtemp=20.0,
              nstartparameters=64, seed=2)
    c_plain = tiny_chain_factory("ptlmc_plain")
    c_plain.run_MCMC_PTLMC(**kw)
    c_shard = tiny_chain_factory("ptlmc_shard")
    c_shard.run_MCMC_PTLMC(devices=8, **kw)
    np.testing.assert_allclose(
        np.asarray(c_shard.chain), np.asarray(c_plain.chain), rtol=1e-7,
        atol=1e-10,
    )


@pytest.mark.slow
def test_public_run_pocomc_devices_matches_single(tiny_chain_factory):
    """Chain.run_pocoMC(devices=8) agrees with single-device through the
    PUBLIC API within the sampler's own reported evidence errors.

    Bitwise equality is not a meaningful end-to-end property for adaptive
    SMC: the data-dependent step count (correlation threshold in a
    while_loop) and the beta bisection amplify ULP-level sharded-reduction
    differences into different—but equally valid—trajectories.  The
    bit-level sharded equality of one adaptive round is pinned separately
    (test_sharded_smc_round_matches_single_device); here the public knob
    must produce the full contract and a consistent evidence."""
    kw = dict(n_effective=32, n_active=16, n_prior=64, n_max_steps=5,
              n_total=32, n_evidence=16, random_state=0)
    c_plain = tiny_chain_factory("smc_plain")
    out_plain = c_plain.run_pocoMC(**kw)
    c_shard = tiny_chain_factory("smc_shard")
    out_shard = c_shard.run_pocoMC(devices=8, **kw)
    for k in ("chain", "weights", "logl", "logp", "logz", "logz_err"):
        assert k in out_shard
    assert out_shard["chain"].shape[1] == out_plain["chain"].shape[1]
    err = np.hypot(out_plain["logz_err"], out_shard["logz_err"])
    assert abs(out_shard["logz"] - out_plain["logz"]) < 3.0 * err + 0.5, (
        out_shard["logz"], out_plain["logz"], err,
    )


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    """The driver-facing dry run must pass on the virtual mesh."""
    import subprocess
    import sys

    res = subprocess.run(
        [sys.executable, "__graft_entry__.py", "8"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "multichip dry run PASSED on 8 devices" in res.stdout


_COLLECTIVES = ("all-gather", "all-reduce", "collective-permute", "all-to-all")


def test_sharded_posterior_hlo_has_no_collectives(tiny_chain_factory):
    """SURVEY section 5's scaling story -- zero communication in the forward
    posterior -- pinned at the compiled-HLO level (VERDICT r3 item 8): the
    walker axis is embarrassingly parallel, so the compiled SPMD module of
    the sharded posterior must contain NO collective ops.  A jax upgrade
    that silently reintroduces an all-gather around any piece of the fused
    predict + likelihood program fails this string match."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    c = tiny_chain_factory("hlo")
    mesh = make_mesh(8)
    log_post, like_state = c.posterior_with_state()
    repl = NamedSharding(mesh, P())
    jitted = jax.jit(
        log_post,
        in_shardings=(jax.tree.map(lambda _: repl, like_state),
                      NamedSharding(mesh, P("walkers", None))),
        out_shardings=NamedSharding(mesh, P("walkers")),
    )
    x = jnp.full((32, 3), 0.5, jnp.float64)
    hlo = jitted.lower(like_state, x).compile().as_text()
    for op in _COLLECTIVES:
        assert op not in hlo, f"forward posterior HLO contains {op}"


def test_sharded_fused_kernel_hlo_has_no_collectives(rng, monkeypatch):
    """Same pin for the fused Pallas predict kernels specifically: their
    custom_partitioning Shardy sharding_rule exists so pjit partitions the
    walker axis instead of all-gathering around the opaque kernel
    (ops/pallas_predict.py header); assert the compiled value-and-grad
    module is collective-free for both the exact and the fast-backward
    entry points.

    The walker count must be LANE-tile aligned (m % 128 == 0, true of
    every production configuration): a non-aligned m is padded up to the
    tile globally, and resharding that pad costs a couple of
    collective-permutes of the pad rows -- the one known communication
    source on this path, excluded here by using an aligned m."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    import gpbayestools_hic_tpu.ops.pallas_predict as pp

    monkeypatch.setattr(pp, "INTERPRET", True)
    monkeypatch.setattr(pp, "FORCE", True)

    b, n, d = 2, 40, 4
    x = rng.uniform(0, 1, size=(n, d))
    params = {
        "log_ls": np.log(rng.uniform(0.5, 2.0, size=(b, d))),
        "log_amp": np.log(rng.uniform(0.5, 2.0, size=b)),
        "log_noise": np.log(np.full(b, 0.05)),
    }
    linv = np.tril(rng.normal(size=(b, n, n)) * 0.1) + np.eye(n)[None]
    alpha = rng.normal(size=(b, n))
    fs = pp.attach_fused_factors(pp.build_fused_state(params, x), linv, alpha)

    mesh = make_mesh(8)
    repl = NamedSharding(mesh, P())
    xq = jnp.asarray(rng.uniform(0, 1, size=(256, d)).astype(np.float32))
    for fn in (pp.fused_pc_predict, pp.fused_pc_predict_fastbwd):
        def loss(state, q, fn=fn):
            mn, qf = fn(state, q)
            return jnp.sum(mn) + jnp.sum(qf)

        jitted = jax.jit(
            jax.grad(loss, argnums=1),
            in_shardings=(jax.tree.map(lambda _: repl, fs),
                          NamedSharding(mesh, P("walkers", None))),
            out_shardings=NamedSharding(mesh, P("walkers", None)),
        )
        hlo = jitted.lower(fs, xq).compile().as_text()
        for op in _COLLECTIVES:
            assert op not in hlo, f"{fn.__name__} grad HLO contains {op}"


@pytest.mark.slow
def test_public_run_hmc_warmup_walkers_sharded(tiny_chain_factory):
    """warmup_walkers under a device mesh: the warmup subset is itself
    sharded (divisibility validated) and the tile-up re-shards cleanly;
    the run must complete with a finite in-support chain."""
    c = tiny_chain_factory("hmc_ww_shard")
    c.run_MCMC_HMC(nsteps=6, nwalkers=16, nburnsteps=4, n_leapfrog=2,
                   seed=5, devices=8, warmup_walkers=8)
    arr = np.asarray(c.chain)
    assert arr.shape[0] == 16
    assert np.all(np.isfinite(arr))
    # non-divisible subset is rejected up front
    c2 = tiny_chain_factory("hmc_ww_bad")
    with pytest.raises(ValueError, match="divisible"):
        c2.run_MCMC_HMC(nsteps=4, nwalkers=16, nburnsteps=4, n_leapfrog=2,
                        seed=5, devices=8, warmup_walkers=6)
