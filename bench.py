"""Flagship benchmark: effective samples/sec on the 544-observable posterior.

Reproduces the reference's flagship workload scale (BASELINE.md):
20 -> 17 effective parameters, 9 emulators with observable blocks summing to
544 (the likelihood covariance dimension), npc=4 GPs per emulator, ~1000
training designs -- and, unlike round 1, drives the REAL production objects:
nine trained :class:`Emulator` instances loaded into a :class:`Chain`, whose
fused ``posterior_with_state()`` program is what the samplers consume
(reference hot path: src/mcmc.py:217, 345-426).

Prints a CUMULATIVE JSON line on stdout after EVERY completed stage (same
schema each time, unmeasured fields null; progress goes to stderr), so a
timeout at any point still leaves the last complete measurement parseable —
the final line is the full record.  Stages run headline-first (HMC right
after the Chain is up, then the ensemble moves, the CPU baseline --
which sets ``vs_baseline`` -- the Pallas generic route, and SMC last),
and the nine trained
flagship emulators are persisted via ``Emulator.save`` to
``cache/flagship/`` and reused on re-run so a congested remote gp_fit
compile is paid at most once per machine (``--fresh`` forces a retrain and
re-measures the gp_train timings).

Fields of the JSON record:

- ``value``: effective samples per second through
  ``Chain.posterior_with_state()`` -- the best of the stretch move, the
  differential-evolution move (``run_ensemble``), and the preconditioned
  HMC sampler (``run_hmc``, ``scheme="windowed"`` -- Neal-windowed
  trajectory sampling with Horowitz persistent momentum, the
  measured-fastest production configuration; see ``HMC_LEAPFROG`` /
  ``HMC_PERSIST`` for the sweep evidence).  ESS via
  integrated autocorrelation time (emcee-style FFT estimator).  The
  ensemble moves' tau is measured on an 8192-step window (8 chunks of the
  compiled 1024-step program, state carried across) so the windowed
  estimator CONVERGES (round-2's 1024-step window was a lower bound on
  tau; ``ensemble_tau_converged`` records the >= 50 tau check).  HMC's
  tau ~ 1.9 converges at its 512-step window and its wall clock includes
  the two windowed-adaptation warmup phases.
- ``vs_baseline``: ratio of ENSEMBLE posterior-evaluation throughput
  against a reference-style CPU evaluator built from the SAME trained
  emulators (serial Python map over walkers; per-PC numpy GP predict;
  stitched 544x544 covariance factored with scipy LAPACK dpotrf/dpotrs,
  exactly src/mcmc.py:23-65's kernel).  ESS-per-evaluation is a sampler
  property independent of backend, so for the like-for-like emcee-style
  sampler the ESS/sec ratio equals this evaluation-throughput ratio; the
  HMC headline (no reference counterpart: the reference posterior has no
  gradients) makes the TRUE end-to-end ratio even larger.
- ``hmc_auto_ess_per_sec`` (+tau/scheme): the NO-KNOB default path --
  ``run_MCMC_HMC``'s promoted defaults (scheme="auto", warmup="auto",
  256-walker adaptation subset) -- measured so the tuned headline's
  reachability is a number, not a claim.
- ``ptlmc_ess_per_sec`` (+tau/converged/wall): PTLMC at the reference's
  flagship knobs (30 temps / 16 chains / maxtemp 100 / 1000 steps,
  src/mcmc.py:696-726) through ``Chain.run_MCMC_PTLMC``.
- ``smc_logz_ps``/``smc_logz_is`` (+errors), ``smc_logz_khat``,
  ``smc_logz_source``: both SMC evidence estimators plus the PSIS tail
  diagnostic of the defensive IS proposal, so the artifact itself shows
  whether they agree.
- secondary fields: ``gp_train_s`` (9-emulator GP training),
  ``evals_per_sec`` (posterior evaluations/s of the best ENSEMBLE run --
  HMC evaluates gradients, so its eval rate is not comparable),
  ``pallas_evals_per_sec`` (likelihood_mode='generic': the per-block dense
  Cholesky route through ops.pallas_mvn.mvn_loglike_best), ``smc_wall_s``
  and ``smc_logz`` (full flow-preconditioned SMC pipeline via
  ``Chain.run_pocoMC``), ``hmc_warm_ess_per_sec`` (steady-state
  continuation rate via ``warm_start`` -- zero warmup gradients, the
  throughput an appended/long run converges to; the headline stays
  warmup-charged), and the winning ``move`` / ``tau``.

- roofline fields: ``flops_per_eval`` (static count of the fused posterior
  program's useful f32 FLOPs -- see ``FLOPS_PER_EVAL``) and
  ``achieved_tflops`` (= flops_per_eval x ensemble evals/s / 1e12, the
  delivered useful-FLOP rate).  At ``Precision.HIGH`` every f32 product is
  3 bf16 MXU passes, so hardware utilization vs the v5e bf16 peak
  (197 TFLOP/s) is ``3 x achieved_tflops / 197`` -- reported as
  ``mxu_util_vs_bf16_peak``.  These make ARCHITECTURE.md's "eval path is
  near its practical floor" a checkable number and surface perf
  regressions independently of tau noise.

``--no-smc`` skips the SMC pipeline (field reported as null).
``--fresh`` ignores the flagship cache and re-trains (re-measuring
``gp_train_s`` / ``gp_train_compile_s``; otherwise cached timings from the
training run are reported with ``gp_train_cached: true``).
``--smc-production`` runs SMC at the reference's flagship scale
(n_effective 8000, n_active 4000, n_prior 16000, n_total 30000,
n_evidence 5000 -- RunBayesianAnalysis.ipynb cell 4 /
src/mcmc.py:752-754 defaults) instead of the default bench scale.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

from gpbayestools_hic_tpu.utils.metrics import integrated_autocorr_time

def _logging_to_stderr():
    """Repoint the package's stdout log handler at stderr.

    The package logs to stdout (the reference's environment contract,
    runtime.py), but the bench's stdout must carry ONLY the cumulative
    JSON record lines.  Called from main() -- NOT at import -- so tools
    that merely ``import bench`` (e.g. tools/flagship_cache.py) keep the
    documented stdout logging."""
    import logging

    for h in logging.getLogger().handlers:
        if getattr(h, "stream", None) is sys.stdout:
            h.setStream(sys.stderr)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Flagship shape (SURVEY.md section 6): blocks per emulator sum to 544.
BLOCKS = (28, 28, 12, 170, 14, 21, 28, 73, 170)
NDIM = 17
NEV = 1000
NPC = 4
NWALKERS = 1024
NSTEPS = 1024
HMC_STEPS = 512      # >> 50 * tau (~1.9): the tau estimate is converged
# warmup="auto": each adaptation phase terminates itself once the dual-
# averaged step size stabilizes with acceptance on target (32-256 steps;
# samplers/hmc.py), so the warmup budget is chosen by the production
# mechanism rather than a benchmark-specific sweep.  The earlier fixed
# sweep found 64/phase optimal here; the auto rule lands in the same
# neighborhood and its cost is charged to the ESS/s wall clock.
HMC_WARMUP = "auto"
# L=7 with Horowitz persistent momentum (persist=0.7): the interleaved
# same-session sweep over (L, persist) found persist 0.7 worth ~8-10% over
# full refresh at both L=7 and L=8 (L8: 7477-8031 -> 8215-8918 ESS/s;
# L7 P=0.7: 8794 vs L7 P=0: 8022), with L=7 matching L=8 at one fewer
# gradient per step (tau 1.86 vs 1.61 -- the extra mixing doesn't pay for
# the extra gradient).  persist>0 needs acceptance ~0.8+ (rejections flip
# the persistent momentum), which the auto-adapted eps delivers here.
HMC_LEAPFROG = 7
HMC_PERSIST = 0.7
# Adaptation on a 256-walker subset (production tiles the warmed state up
# to 1024): warmup gradient-walkers drop 409.6k -> 122.9k (the auto
# stopper runs 96 subset steps vs 80 full-batch) at tau 2.23 vs 2.21 --
# +6.6% ESS per gradient by deterministic count (tunnel dispatch noise
# swamps a wall-clock A/B at the +5% level; same-config repeats spread
# 8%).  128 walkers saves little more and costs tau 2.29.
HMC_WARMUP_WALKERS = 256
CPU_BASELINE_WALKERS = 7
# PTLMC at the reference's flagship knobs (RunBayesianAnalysis.ipynb cell 6
# / src/mcmc.py:696-726): 30 temperatures, 16 chains, maxtemp 100, 1000
# production steps (the sampler runs 2x tuning steps internally), 1000
# pre-optimization starts.  The wall clock charges the WHOLE run: pre-opt
# L-BFGS, tuning, production -- the honest one-shot cost.
PTLMC_TEMPS = 30
PTLMC_CHAINS = 16
PTLMC_MAXTEMP = 100.0
PTLMC_STEPS = 1000
PTLMC_NSTART = 1000
# ensemble tau window: 8 x 1024 = 8192 steps >> 50 * tau (~90) so the
# windowed FFT estimator converges (round-2 bench was window-limited)
ENS_TAU_CHUNKS = 8

# Static useful-FLOP count of ONE fused posterior evaluation (f32 ops; a
# fused multiply-add counts as 2).  Dominant term: the 36 predictive-
# variance products G @ k* with G = L^-1 at (nev, nev) -- 2*npc*nev^2 per
# emulator.  Plus, per emulator: the RBF k* build (squared scaled distance
# 3*ndim ops + ~10 for the exp/scale epilogue per (pc, train) entry) and
# the k*@alpha mean and |G k*|^2 norm reductions (2*npc*nev each).  Since
# the round-5 PC-space Woodbury reduction (samplers/chain.py
# make_lowrank_block) the likelihood epilogue beyond the GP predict is
# O(npc^2) per block (< 0.01% -- the PC->observable projection, exp
# subtraction, and per-walker O(n_e^2) c0_inv matvec all collapsed into
# precomputed (npc, npc) constants) and is left uncounted, as are the
# other O(nobs)-class terms.
FLOPS_PER_EVAL = int(
    len(BLOCKS) * (
        2 * NPC * NEV * NEV                # variance products  (dominant)
        + NPC * NEV * (3 * NDIM + 10)      # kstar kernel build
        + 2 * 2 * NPC * NEV                # mean + norm reductions
    )
)
# one v5e chip: 197 TFLOP/s bf16 (394 is the INT8 TOPS figure -- an
# earlier revision used it here and understated MXU occupancy by 2x)
V5E_BF16_PEAK_TFLOPS = 197.0
# Precision.HIGH f32 products are 3 bf16 MXU passes (hi/lo split): the
# hardware executes ~3x the useful FLOPs counted above.
HIGH_PRECISION_PASSES = 3

CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "cache", "flagship"
)


def build_or_load_chain(fresh: bool = False, cache_dir: str = CACHE_DIR,
                        measure_timings: bool = True):
    """Flagship Chain: 9 real trained emulators (544 observables) loaded
    into a real Chain (the exact objects RunBayesianAnalysis.ipynb drives
    in the reference).

    First (or ``--fresh``) run trains from scratch, measures the split
    gp_train timings (skipped -- reported as None -- when
    ``measure_timings=False``: tools that only need the Chain should not
    pay the second warm retrain the split requires), and persists the
    emulators + parameter/exp files + timings under ``cache_dir``
    (``Emulator.save`` round-trips skip the gp_fit compile entirely --
    CLAUDE.md); later runs reconstruct the identical Chain in seconds so
    a congested remote compile can never starve the headline stages.

    Returns ``(chain, gp_train_s, gp_train_compile_s, cached)`` --
    the timings are None when never measured for this cache.
    """
    from gpbayestools_hic_tpu.samplers import Chain

    marker = os.path.join(cache_dir, "ok")
    timings_path = os.path.join(cache_dir, "timings.json")
    if not fresh and os.path.exists(marker):
        log(f"loading flagship chain from cache ({cache_dir}) ...")
        tmp = tempfile.mkdtemp(prefix="bench_flagship_cached_")
        chain = Chain(
            mcmc_path=os.path.join(tmp, "mcmc", "chain.pkl"),
            expdata_path=os.path.join(cache_dir, "exp.pkl"),
            model_parafile=os.path.join(cache_dir, "pars.txt"),
        )
        chain.loadEmulator(
            [os.path.join(cache_dir, f"emu{i}.npz")
             for i in range(len(BLOCKS))]
        )
        # caches written before timings were recorded (or with
        # measure_timings=False) have no timings.json: the chain is still
        # fully valid, only the timing fields are unknown
        try:
            with open(timings_path) as f:
                t = json.load(f)
        except FileNotFoundError:
            t = {"gp_train_s": None, "gp_train_compile_s": None}
        return chain, t["gp_train_s"], t["gp_train_compile_s"], True

    from gpbayestools_hic_tpu.utils.synthetic import build_synthetic_chain

    src_dir = tempfile.mkdtemp(prefix="bench_flagship_")
    t0 = time.perf_counter()
    chain, gp_train_total_s = build_synthetic_chain(
        nev=NEV, ndim=NDIM, nobs_blocks=BLOCKS, npc=NPC, gp_maxiter=30,
        seed=0, tmpdir=src_dir,
    )
    log(f"emulator training ({len(BLOCKS)} emulators x {NPC} GPs, nev={NEV}):"
        f" {gp_train_total_s:.1f}s incl. compile "
        f"(total build {time.perf_counter() - t0:.1f}s)")
    gp_train_s = gp_train_compile_s = None
    if measure_timings:
        # Separate compile from compute: retrain the identical joint fit
        # (same shapes/statics -> the compiled program is reused), so the
        # second wall time is pure compute.  Round-2's single number
        # (194.8 s) was almost entirely remote-compile congestion on the
        # shared tunnel and contradicted the documented ~20 s compute
        # (VERDICT r2).
        from gpbayestools_hic_tpu.models import train_emulators_jointly

        t0 = time.perf_counter()
        train_emulators_jointly(chain.emuList)
        gp_train_s = time.perf_counter() - t0
        gp_train_compile_s = max(gp_train_total_s - gp_train_s, 0.0)
        log(f"emulator training warm (compiled program reused): "
            f"{gp_train_s:.1f}s compute + {gp_train_compile_s:.1f}s compile")

    import shutil

    os.makedirs(cache_dir, exist_ok=True)
    # a --fresh overwrite of a live cache must invalidate it FIRST: if this
    # process is killed mid-save (the exact timeout scenario the staged
    # bench emission defends against), a stale marker over a mixed
    # old/new emulator set would validate an inconsistent cache
    for stale in (marker, timings_path):
        try:
            os.remove(stale)
        except FileNotFoundError:
            pass
    for name in ("pars.txt", "exp.pkl"):
        shutil.copy(os.path.join(src_dir, name), os.path.join(cache_dir, name))
    for i, e in enumerate(chain.emuList):
        e.save(os.path.join(cache_dir, f"emu{i}.npz"))
    if measure_timings:
        with open(timings_path, "w") as f:
            json.dump({"gp_train_s": round(gp_train_s, 2),
                       "gp_train_compile_s": round(gp_train_compile_s, 2),
                       "measured_utc": time.strftime(
                           "%Y-%m-%dT%H:%M:%SZ", time.gmtime())}, f)
    with open(marker, "w") as f:
        f.write("flagship cache complete\n")
    log(f"flagship chain cached to {cache_dir}")
    return chain, gp_train_s, gp_train_compile_s, False


def cpu_reference_eval_rate(chain, walkers):
    """Reference-style evaluator from the SAME trained emulators: serial map
    over walkers, per-PC numpy GP predict, stitched 544x544 covariance,
    scipy dpotrf/dpotrs (src/mcmc.py:23-65, 153-166, 217)."""
    from scipy.linalg import lapack

    nobs_total = chain.nobs
    offsets = np.cumsum([0] + [e.nobs for e in chain.emuList])
    exp_mean = np.asarray(chain.expdata, dtype=np.float64).flatten()
    exp_var = np.diag(np.asarray(chain.expdata_cov, dtype=np.float64))

    nps = []
    for e in chain.emuList:
        st = e.gp_state
        a, cov_trunc = e.lowrank_parts()
        nps.append(
            dict(
                x=np.asarray(st.x, dtype=np.float64),
                alpha_vec=np.asarray(st.alpha_vec, dtype=np.float64),
                chol=np.asarray(st.chol, dtype=np.float64),
                ls=np.exp(np.asarray(st.params["log_ls"], dtype=np.float64)),
                amp=np.exp(np.asarray(st.params["log_amp"], dtype=np.float64)),
                noise=np.exp(np.asarray(st.params["log_noise"], dtype=np.float64)),
                trans=np.asarray(a, dtype=np.float64),
                mean_shift=np.asarray(e.scaler.mean, dtype=np.float64),
                cov_trunc=np.asarray(cov_trunc, dtype=np.float64),
            )
        )

    from scipy.linalg import solve_triangular

    def eval_one(theta):
        mean_full = np.zeros(nobs_total)
        cov_full = np.zeros((nobs_total, nobs_total))
        for e, i0, i1 in zip(nps, offsets[:-1], offsets[1:]):
            npc = e["alpha_vec"].shape[0]
            gp_mean = np.empty(npc)
            gp_var = np.empty(npc)
            for k in range(npc):  # the reference's per-PC GP loop
                xs = e["x"] / e["ls"][k]
                q = theta / e["ls"][k]
                d2 = np.sum((xs - q) ** 2, axis=1)
                kstar = e["amp"][k] * np.exp(-0.5 * d2)
                gp_mean[k] = kstar @ e["alpha_vec"][k]
                # a TRIANGULAR solve, exactly what sklearn GPR.predict
                # does -- a general LU solve here would be ~20x slower at
                # n=1000 and unfairly inflate the vs_baseline ratio
                v = solve_triangular(e["chol"][k], kstar, lower=True)
                gp_var[k] = e["amp"][k] + e["noise"][k] - v @ v
            a = e["trans"]
            mean_full[i0:i1] = gp_mean @ a + e["mean_shift"]
            cov_full[i0:i1, i0:i1] = (a.T * gp_var @ a) + e["cov_trunc"]
        cov_full[np.diag_indices_from(cov_full)] += exp_var
        dy = mean_full - exp_mean
        L, info = lapack.dpotrf(cov_full, clean=False)
        alpha, info = lapack.dpotrs(L, dy)
        return -0.5 * dy @ alpha - np.log(L.diagonal()).sum()

    thetas = np.random.default_rng(1).uniform(0.2, 0.8, size=(walkers, NDIM))
    eval_one(thetas[0])  # warm numpy caches
    # per-eval MEDIAN of several timed evals: round 2 used min-of-3, whose
    # recorded ratio swung 1.1-3.1e5 across runs from host-load noise alone
    # (VERDICT r2).  The median is robust to transient load in both
    # directions and still conservative (the baseline is single-threaded
    # numpy/LAPACK, exactly the reference's serial map).
    times = []
    for th in thetas:
        t0 = time.perf_counter()
        eval_one(th)
        times.append(time.perf_counter() - t0)
    return 1.0 / float(np.median(times))


def _max_tau(chain_arr):
    """(max_d tau_d, all-dims-converged) for a (nwalkers, nsteps, ndim)
    window -- the one tau-aggregation rule every bench stage shares."""
    taus, convs = zip(*(
        integrated_autocorr_time(chain_arr[:, :, d], return_converged=True)
        for d in range(chain_arr.shape[-1])
    ))
    return float(np.max(taus)), all(convs)


def bench_move(chain, move, dtype, n_chunks: int = ENS_TAU_CHUNKS):
    """Compile once, then time ``n_chunks`` x NSTEPS production ensemble
    steps with ``move``; returns (ess_per_sec, evals_per_sec, tau,
    tau_converged).

    The tau estimate uses the CONCATENATED (NWALKERS, n_chunks * NSTEPS)
    window: the windowed FFT estimator is biased low on short chains (tau
    grew 22 -> 87 from 256 -> 2048 steps on this posterior in round 2), so
    the window is extended until ``nsteps >= 50 tau`` and the convergence
    flag is reported.  Chunking reuses the one compiled NSTEPS-step program
    (the state carries across chunks, so the concatenation IS one long
    chain)."""
    import jax
    import jax.numpy as jnp

    from gpbayestools_hic_tpu.samplers.ensemble import run_ensemble

    log_post, like_state = chain.posterior_with_state()
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.uniform(0.3, 0.7, size=(NWALKERS, NDIM)).astype(dtype))

    # Warmup/compile the exact NSTEPS program (nsteps is a static argument:
    # warming with a different length would leave compilation in the timing).
    log(f"[{move}] compiling sampler ...")
    t0 = time.perf_counter()
    res = run_ensemble(log_post, x0, NSTEPS, jax.random.PRNGKey(0),
                       state=like_state, move=move)
    res.final_log_prob.block_until_ready()
    log(f"[{move}] compile+warmup: {time.perf_counter() - t0:.1f}s")

    chunks = []
    dt = 0.0
    acc = 0.0
    for c in range(n_chunks):
        t0 = time.perf_counter()
        res = run_ensemble(
            log_post, res.final_state, NSTEPS, jax.random.PRNGKey(1 + c),
            state=like_state, move=move,
        )
        res.final_log_prob.block_until_ready()
        dt += time.perf_counter() - t0
        chunks.append(np.asarray(res.chain))
        acc += float(res.acceptance.mean()) / n_chunks
    nsteps_total = n_chunks * NSTEPS
    steps_per_sec = nsteps_total / dt
    evals_per_sec = steps_per_sec * NWALKERS

    chain_arr = np.concatenate(chunks, axis=1)  # (nwalkers, total, ndim)
    tau, converged = _max_tau(chain_arr)
    ess_per_sec = (NWALKERS / tau) * steps_per_sec
    conv_note = (
        f"(converged: window {nsteps_total} >= 50 tau)" if converged
        else " (WINDOW-LIMITED: tau is a lower bound)"
    )
    log(f"[{move}] {dt:.2f}s -> {steps_per_sec:.1f} steps/s, "
        f"{evals_per_sec:.0f} evals/s, max tau {tau:.1f} {conv_note}, "
        f"ESS/sec {ess_per_sec:.1f}, acc {acc:.3f}")
    return ess_per_sec, evals_per_sec, tau, converged


def bench_hmc(chain, dtype):
    """Preconditioned HMC through the same fused posterior: ESS/s charged
    with the FULL wall clock of a fresh adaptive run (auto-terminated
    adaptation phases + HMC_STEPS production), compilation excluded."""
    import jax
    import jax.numpy as jnp

    from gpbayestools_hic_tpu.samplers.hmc import run_hmc

    log_post, like_state = chain.posterior_with_state()
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.uniform(0.3, 0.7, size=(NWALKERS, NDIM)).astype(dtype))
    # scheme="windowed" (Neal-windowed trajectory sampling, default W=2):
    # same gradient cost per step as the endpoint-Metropolis scheme but
    # measured ~8% more ESS/s on this posterior (8061/7777/8181 vs
    # 7347/7362 across repeat runs; W=3 loses, tau 2.00 vs 1.78).
    kwargs = dict(state=like_state, lo=chain.min, hi=chain.max,
                  n_leapfrog=HMC_LEAPFROG, warmup=HMC_WARMUP,
                  scheme="windowed", persist=HMC_PERSIST,
                  warmup_walkers=HMC_WARMUP_WALKERS)

    log("[hmc] compiling sampler ...")
    t0 = time.perf_counter()
    res = run_hmc(log_post, x0, HMC_STEPS, jax.random.PRNGKey(0), **kwargs)
    np.asarray(res.final_state)
    log(f"[hmc] compile+first adaptive run: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    res = run_hmc(log_post, res.final_state, HMC_STEPS, jax.random.PRNGKey(1),
                  **kwargs)
    chain_arr = np.asarray(res.chain)  # (nwalkers, nsteps, ndim); syncs
    dt = time.perf_counter() - t0

    tau, hmc_conv = _max_tau(chain_arr)
    ess_per_sec = (NWALKERS * HMC_STEPS / tau) / dt
    acc = float(np.mean(np.asarray(res.acceptance)))
    conv_note = (
        f"(converged: window {HMC_STEPS} >= 50 tau)" if hmc_conv
        else "(WINDOW-LIMITED: tau is a lower bound)"
    )
    log(f"[hmc] {dt:.2f}s for {res.warmup_steps}+{HMC_STEPS} steps, "
        f"max tau {tau:.2f} {conv_note}, "
        f"ESS/sec {ess_per_sec:.1f}, acc {acc:.3f}, eps {res.step_size:.4f}")

    # Steady-state continuation rate (secondary field, NOT the headline):
    # warm_start reuses the adapted metric/step size so a resumed run pays
    # zero warmup gradients -- the throughput a long or appended run
    # converges to.  The headline above stays warmup-charged.
    t0 = time.perf_counter()
    res_w = run_hmc(log_post, res.final_state, HMC_STEPS,
                    jax.random.PRNGKey(2), warm_start=res, **kwargs)
    warm_chain = np.asarray(res_w.chain)
    dt_w = time.perf_counter() - t0
    tau_w, warm_conv = _max_tau(warm_chain)
    warm_ess_per_sec = (NWALKERS * HMC_STEPS / tau_w) / dt_w
    warm_note = "converged" if warm_conv else "WINDOW-LIMITED"
    log(f"[hmc] warm-start continuation: {dt_w:.2f}s for {HMC_STEPS} steps, "
        f"max tau {tau_w:.2f} ({warm_note}), ESS/sec {warm_ess_per_sec:.1f}")
    return ess_per_sec, tau, hmc_conv, warm_ess_per_sec, warm_conv


def bench_hmc_default(chain, dtype):
    """The NO-KNOB HMC path: exactly what ``run_MCMC_HMC(nsteps=...)`` now
    resolves its defaults to (scheme="auto" -> windowed+persist at high
    adapted acceptance, warmup="auto", L=8, 256-walker adaptation subset).
    Recorded so the headline config's reachability is a measured number:
    the default path must land within a few % of the tuned headline."""
    import jax
    import jax.numpy as jnp

    from gpbayestools_hic_tpu.samplers.hmc import run_hmc

    log_post, like_state = chain.posterior_with_state()
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(rng.uniform(0.3, 0.7, size=(NWALKERS, NDIM)).astype(dtype))
    kwargs = dict(state=like_state, lo=chain.min, hi=chain.max,
                  n_leapfrog=8, warmup="auto", scheme="auto",
                  warmup_walkers=min(256, NWALKERS))

    log("[hmc-auto] compiling default-path sampler ...")
    t0 = time.perf_counter()
    res = run_hmc(log_post, x0, HMC_STEPS, jax.random.PRNGKey(0), **kwargs)
    np.asarray(res.final_state)
    log(f"[hmc-auto] compile+first adaptive run: "
        f"{time.perf_counter() - t0:.1f}s (resolved scheme {res.scheme}, "
        f"persist {res.persist})")

    t0 = time.perf_counter()
    res = run_hmc(log_post, res.final_state, HMC_STEPS,
                  jax.random.PRNGKey(1), **kwargs)
    chain_arr = np.asarray(res.chain)
    dt = time.perf_counter() - t0
    tau, conv = _max_tau(chain_arr)
    ess_per_sec = (NWALKERS * HMC_STEPS / tau) / dt
    conv_note = "converged" if conv else "WINDOW-LIMITED"
    log(f"[hmc-auto] {dt:.2f}s for {res.warmup_steps}+{HMC_STEPS} steps, "
        f"max tau {tau:.2f} ({conv_note}), ESS/sec {ess_per_sec:.1f}, "
        f"scheme {res.scheme} persist {res.persist}")
    return ess_per_sec, tau, res.scheme


def bench_ptlmc(chain):
    """PTLMC at the reference's flagship knobs through the public
    ``Chain.run_MCMC_PTLMC`` front-end (the only reference sampler family
    without a TPU perf record before round 5).  Two runs: the first
    carries the XLA compiles, the second is the timed measurement."""
    kwargs = dict(nsteps=PTLMC_STEPS, nwalkers=PTLMC_CHAINS,
                  ntemps=PTLMC_TEMPS, maxtemp=PTLMC_MAXTEMP,
                  nstartparameters=PTLMC_NSTART)

    log("[ptlmc] compiling sampler (pre-opt + tuning + production) ...")
    t0 = time.perf_counter()
    chain.run_MCMC_PTLMC(seed=0, **kwargs)
    log(f"[ptlmc] compile+first run: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    chain.run_MCMC_PTLMC(seed=1, **kwargs)
    dt = time.perf_counter() - t0
    arr = np.asarray(chain.chain)  # (nwalkers, nsteps, ndim), T=1 chains
    tau, conv = _max_tau(arr)
    ess_per_sec = (PTLMC_CHAINS * PTLMC_STEPS / tau) / dt
    conv_note = (
        f"(converged: window {PTLMC_STEPS} >= 50 tau)" if conv
        else "(WINDOW-LIMITED: tau is a lower bound, ESS/s an upper bound)"
    )
    log(f"[ptlmc] {dt:.2f}s for {PTLMC_TEMPS}t x {PTLMC_CHAINS}c x "
        f"{PTLMC_STEPS} steps (+2x tuning, {PTLMC_NSTART} pre-opt starts), "
        f"max tau {tau:.1f} {conv_note}, ESS/sec {ess_per_sec:.1f}")
    return ess_per_sec, tau, conv, dt


def bench_pallas_block_route(chain, dtype):
    """likelihood_mode='generic': per-block dense Cholesky through
    ops.pallas_mvn.mvn_loglike_best (the Pallas TPU kernel), checked against
    the Woodbury path and timed."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0.3, 0.7, size=(512, NDIM)).astype(dtype))

    lp_auto = np.asarray(chain.log_posterior(x))
    # stash the compiled auto-mode programs: rebuilding them after this
    # stage would charge a full re-trace (and possibly a congested remote
    # compile) to the SMC wall-clock measurement that follows
    saved_fns, saved_state = chain._device_fns, chain._like_state
    chain.likelihood_mode = "generic"
    chain._device_fns = None
    try:
        fns = chain.device_fns
        fn, st = fns["log_posterior"], chain._like_state
        lp = fn(st, x)
        lp.block_until_ready()
        lp_generic = np.asarray(lp)
        # agreement between the Cholesky-block route and the Woodbury path.
        # Since v0.3.11 the auto path's kstar comes from the fused Pallas
        # predict (f64-prepped operands; validated 0.145 log-units vs f64
        # by tools/tpu_validation.py) while the generic route keeps the
        # plain XLA predict (~0.34 log-units class), so a mutual diff at
        # the ~1e-3 level is two valid f32 pipelines disagreeing with each
        # other, not a wrong kernel; beyond 5e-3 IS a kernel bug.
        denom = np.maximum(np.abs(lp_auto), 1.0)
        max_rel = float(np.max(np.abs(lp_generic - lp_auto) / denom))
        log(f"[pallas] generic vs auto max rel diff: {max_rel:.2e}")
        if max_rel > 5e-3:
            log("[pallas] WARNING: generic route DISAGREES with the "
                "Woodbury path beyond tolerance; its evals/s is the "
                "throughput of a wrong kernel")
        t0 = time.perf_counter()
        n_rep = 5
        for _ in range(n_rep):
            lp = fn(st, x)
        lp.block_until_ready()
        rate = n_rep * x.shape[0] / (time.perf_counter() - t0)
        log(f"[pallas] generic-mode (dense block Cholesky): {rate:.0f} evals/s")
    finally:
        chain.likelihood_mode = "auto"
        chain._device_fns = saved_fns
        chain._like_state = saved_state
    return rate, max_rel


# default bench scale vs the reference's flagship production scale
# (/root/reference/src/mcmc.py:752-754 defaults as driven by
# RunBayesianAnalysis.ipynb cell 4)
SMC_BENCH = dict(n_effective=2000, n_active=1000, n_prior=4000,
                 n_max_steps=50, n_total=8000, n_evidence=2000)
SMC_PRODUCTION = dict(n_effective=8000, n_active=4000, n_prior=16000,
                      n_max_steps=50, n_total=30000, n_evidence=5000)


def bench_smc(chain, knobs=SMC_BENCH):
    """Full flow-preconditioned SMC pipeline (BASELINE config #5) through
    the production Chain.run_pocoMC + posterior k-means clustering."""
    import jax
    import jax.numpy as jnp

    from gpbayestools_hic_tpu.utils.cluster import kmeans

    t0 = time.perf_counter()
    out = chain.run_pocoMC(random_state=0, **knobs)
    dt = time.perf_counter() - t0
    w = out["weights"]
    ess = 1.0 / np.sum(w**2)
    khat = out.get("logz_khat")
    log(f"[smc] {dt:.1f}s, {len(w)} weighted samples, ESS {ess:.0f}, "
        f"logz={out['logz']:.2f}+-{out['logz_err']:.3f} "
        f"(source {out['logz_source']}, "
        f"PS {out['logz_ps']:.2f}+-{out['logz_err_ps']:.3f}, "
        f"IS {out['logz_is']}+-{out['logz_err_is']}, khat {khat}, "
        f"bridge {out.get('logz_bridge')}+-{out.get('logz_err_bridge')})")
    # posterior clustering on an unweighted resample (C18 parity)
    from gpbayestools_hic_tpu.utils import resample_weighted

    samples = resample_weighted(out["chain"], w, n=2000, seed=0)
    centers, _, inertia = kmeans(
        jnp.asarray(samples), 3, key=jax.random.PRNGKey(0)
    )
    log(f"[smc] posterior k-means: inertia {float(inertia):.1f}")
    return dt, float(ess), out


def wait_for_device(max_wait_s: float | None = None, poll_s: float = 60.0):
    """Block until a JAX backend initializes (the axon TPU tunnel on this
    image has transient outages: 'Unable to initialize backend' raised from
    the first eager op).  Probes in a SUBPROCESS first -- JAX caches a
    failed backend init for the life of the process, so an in-process
    retry loop would re-raise the cached error forever.  Returns the first
    device; raises after ``max_wait_s`` so a hard outage still fails loudly
    instead of hanging the benchmark.  ``max_wait_s`` defaults to the
    ``BENCH_MAX_WAIT_S`` env var (1800 s if unset) -- raise it when riding
    out a long axon outage."""
    import os
    import subprocess

    if max_wait_s is None:
        max_wait_s = float(os.environ.get("BENCH_MAX_WAIT_S", "1800"))
    deadline = time.monotonic() + max_wait_s
    while True:
        # a probe can HANG on a congested tunnel (blocked RPC), not just
        # fail -- bound it by the remaining budget and treat a timeout as
        # "still unavailable"
        budget = max(deadline - time.monotonic(), 15.0)
        err = ""
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, text=True, timeout=min(600.0, budget),
            )
            if probe.returncode == 0:
                import jax

                return jax.devices()[0]
            err = probe.stderr[-2000:]
        except subprocess.TimeoutExpired:
            err = "probe timed out (backend init hanging)"
        if time.monotonic() >= deadline:
            raise RuntimeError(
                "no JAX backend came up within "
                f"{max_wait_s:.0f}s; last probe:\n{err}"
            )
        log(f"device backend unavailable; retrying in {poll_s:.0f}s")
        time.sleep(poll_s)


# every field the final record carries, in emission order; unmeasured
# stages stay null so every cumulative line has the SAME schema
_RECORD_FIELDS = (
    "metric", "value", "unit", "vs_baseline", "move", "tau", "stage",
    "ensemble_ess_per_sec", "ensemble_move", "ensemble_tau",
    "ensemble_tau_converged",
    "hmc_ess_per_sec", "hmc_warm_ess_per_sec", "hmc_warm_tau_converged",
    "hmc_tau_converged", "evals_per_sec",
    "hmc_auto_ess_per_sec", "hmc_auto_tau", "hmc_auto_scheme",
    "ptlmc_ess_per_sec", "ptlmc_tau", "ptlmc_tau_converged", "ptlmc_wall_s",
    "gp_train_s", "gp_train_compile_s", "gp_train_cached",
    "flops_per_eval", "achieved_tflops", "mxu_util_vs_bf16_peak",
    "pallas_evals_per_sec", "pallas_max_rel_diff",
    "smc_wall_s", "smc_logz", "smc_logz_err", "smc_ess", "smc_scale",
    "smc_logz_source", "smc_logz_ps", "smc_logz_err_ps",
    "smc_logz_is", "smc_logz_err_is", "smc_logz_khat",
    "smc_logz_bridge", "smc_logz_err_bridge",
)


class Emitter:
    """Cumulative stdout record: one full-schema JSON line per completed
    stage, so the driver parses the last complete measurement even if a
    later stage is killed by a timeout (VERDICT r3 item 1 -- the round-3
    driver artifact was empty because the single end-of-run line never
    printed)."""

    def __init__(self):
        self.record = {k: None for k in _RECORD_FIELDS}
        self.record.update(
            metric="ess_per_sec_flagship_544obs_17param",
            unit="effective samples/s",
        )

    def emit(self, stage: str, **fields):
        self.record.update(fields, stage=stage)
        print(json.dumps(self.record), flush=True)


def main():
    import jax

    from gpbayestools_hic_tpu.config import enable_compilation_cache

    _logging_to_stderr()
    enable_compilation_cache()
    dtype = np.float32
    em = Emitter()
    try:
        dev = wait_for_device()
    except RuntimeError as exc:
        # The axon TPU tunnel has full outages lasting hours (CLAUDE.md).
        # Still emit ONE parseable JSON line so the driver's record shows
        # the infrastructure cause instead of a bare stack trace, then fail
        # loudly: value 0 is honest (nothing was measured this run).
        log(f"FATAL: {exc}")
        em.emit(
            "outage", value=0.0, vs_baseline=0.0,
            error="axon TPU backend outage: no device came up within "
                  "the wait budget (BENCH_MAX_WAIT_S); nothing measured "
                  "this run -- see the last committed BENCH record for "
                  "the most recent successful measurement",
        )
        raise SystemExit(1)
    log(f"device: {dev.platform} ({dev.device_kind})")

    log("building flagship problem (9 emulators, 544 observables) ...")
    chain, gp_train_s, gp_train_compile_s, cached = build_or_load_chain(
        fresh="--fresh" in sys.argv
    )
    rnd = lambda v: None if v is None else round(v, 1)  # noqa: E731
    em.emit("chain_ready",
            gp_train_s=rnd(gp_train_s),
            gp_train_compile_s=rnd(gp_train_compile_s),
            gp_train_cached=bool(cached),
            flops_per_eval=FLOPS_PER_EVAL)

    # headline sampler FIRST: nothing after this point can starve it
    (hmc_ess, hmc_tau, hmc_tau_converged,
     hmc_warm_ess, hmc_warm_converged) = bench_hmc(chain, dtype)
    em.emit("hmc",
            value=round(hmc_ess, 2), move="hmc", tau=round(hmc_tau, 2),
            hmc_ess_per_sec=round(hmc_ess, 1),
            hmc_warm_ess_per_sec=round(hmc_warm_ess, 1),
            hmc_warm_tau_converged=bool(hmc_warm_converged),
            hmc_tau_converged=bool(hmc_tau_converged))

    # the no-knob default path (run_MCMC_HMC defaults): must track the
    # tuned headline -- the measured evidence that scheme="auto" works
    auto_ess, auto_tau, auto_scheme = bench_hmc_default(chain, dtype)
    log(f"default-path vs tuned headline: {auto_ess / hmc_ess:.3f}")
    em.emit("hmc_auto",
            hmc_auto_ess_per_sec=round(auto_ess, 1),
            hmc_auto_tau=round(auto_tau, 2),
            hmc_auto_scheme=auto_scheme)

    results = {}
    for move in ("stretch", "de"):
        results[move] = bench_move(chain, move, dtype)
    best_ens = max(results, key=lambda m: results[m][0])
    ens_ess, evals_per_sec, ens_tau, ens_tau_converged = results[best_ens]
    if hmc_ess > ens_ess:
        best_move, ess_per_sec, tau = "hmc", hmc_ess, hmc_tau
    else:
        best_move, ess_per_sec, tau = best_ens, ens_ess, ens_tau
    log(f"best sampler: {best_move}")
    achieved_tflops = FLOPS_PER_EVAL * evals_per_sec / 1e12
    em.emit("ensemble",
            value=round(ess_per_sec, 2), move=best_move, tau=round(tau, 2),
            ensemble_ess_per_sec=round(ens_ess, 1), ensemble_move=best_ens,
            ensemble_tau=round(ens_tau, 1),
            ensemble_tau_converged=bool(ens_tau_converged),
            evals_per_sec=round(evals_per_sec, 0),
            achieved_tflops=round(achieved_tflops, 2),
            mxu_util_vs_bf16_peak=round(
                HIGH_PRECISION_PASSES * achieved_tflops
                / V5E_BF16_PEAK_TFLOPS, 3))

    log(f"measuring reference-style CPU baseline "
        f"({CPU_BASELINE_WALKERS} serial evals) ...")
    cpu_rate = cpu_reference_eval_rate(chain, CPU_BASELINE_WALKERS)
    log(f"reference-style CPU: {cpu_rate:.2f} evals/s")
    # ESS/eval is a sampler property -> ESS/sec ratio == eval-rate ratio
    em.emit("cpu_baseline", vs_baseline=round(evals_per_sec / cpu_rate, 1))

    pallas_rate, pallas_rel = bench_pallas_block_route(chain, dtype)
    em.emit("pallas",
            pallas_evals_per_sec=round(pallas_rate, 0),
            # generic-route vs Woodbury agreement: the correctness check
            # that gives the throughput number meaning (healthy ~1e-5 f32)
            pallas_max_rel_diff=float(f"{pallas_rel:.2e}"))

    # PTLMC at the reference flagship knobs (the last sampler family to
    # get a TPU perf record)
    ptlmc_ess, ptlmc_tau, ptlmc_conv, ptlmc_dt = bench_ptlmc(chain)
    em.emit("ptlmc",
            ptlmc_ess_per_sec=round(ptlmc_ess, 1),
            ptlmc_tau=round(ptlmc_tau, 1),
            ptlmc_tau_converged=bool(ptlmc_conv),
            ptlmc_wall_s=round(ptlmc_dt, 1))

    if "--no-smc" not in sys.argv:
        production = "--smc-production" in sys.argv
        knobs = SMC_PRODUCTION if production else SMC_BENCH
        smc_wall_s, smc_ess, out = bench_smc(chain, knobs)
        rnd3 = lambda v: None if v is None else round(v, 3)  # noqa: E731
        em.emit("smc",
                smc_wall_s=round(smc_wall_s, 1),
                smc_logz=round(float(out["logz"]), 2),
                smc_logz_err=round(float(out["logz_err"]), 3),
                smc_ess=round(smc_ess, 0),
                smc_scale="production" if production else "bench",
                # both evidence estimators + the PSIS tail diagnostic: the
                # artifact itself shows whether IS and PS agree (VERDICT r4
                # item 1's acceptance criterion)
                smc_logz_source=out["logz_source"],
                smc_logz_ps=rnd3(out["logz_ps"]),
                smc_logz_err_ps=rnd3(out["logz_err_ps"]),
                smc_logz_is=rnd3(out["logz_is"]),
                smc_logz_err_is=rnd3(out["logz_err_is"]),
                smc_logz_khat=rnd3(out.get("logz_khat")),
                smc_logz_bridge=rnd3(out.get("logz_bridge")),
                smc_logz_err_bridge=rnd3(out.get("logz_err_bridge")))
    else:
        em.emit("smc", smc_scale="skipped")


if __name__ == "__main__":
    main()
