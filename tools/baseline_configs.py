"""Run the five BASELINE.json benchmark configurations end to end.

The driver metadata (BASELINE.json) names five configurations the rebuild
must cover; this script exercises each at meaningful scale and prints a
summary table (plus ``baseline_configs.json`` in the working directory):

1. sklearn-GP baseline: Matern emulator, 5-param/50-pt LHD toy design,
   exact Cholesky (EmulatorTraining flow)
2. PCGP: PCA-projected multi-observable GP on a 500-pt LHD design
3. PCSK: heteroskedastic simulation-noise GP + closure validation
4. Ensemble MCMC: 200 vmapped walkers + a PTLMC tempering ladder
5. Full pipeline: flow-preconditioned SMC + posterior cluster sampling

Runs on whatever device JAX selects (TPU in production).
"""

from __future__ import annotations

import json
import pickle
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

# runnable from the repo root without installation
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_problem(td, nev, ndim, nobs, seed=0, noise=0.01):
    rng = np.random.default_rng(seed)
    from gpbayestools_hic_tpu.design.lhd import generate_lhs

    # capped annealing budget: large-n LHS optimization is quality polish,
    # not the subject of these configs (and long single scans have tripped
    # TPU-worker watchdogs on some runtimes)
    design = generate_lhs(nev, ndim, seed=seed, cache=False,
                          niters=min(4000, 200 * nev))
    freqs = rng.uniform(0.5, 2.0, size=(ndim, nobs))
    base = 2.0 + np.sin(design @ freqs) + 0.3 * (design**2) @ freqs
    err = noise * np.abs(base) * rng.uniform(0.5, 1.0, size=base.shape)
    noisy = base + err * rng.normal(size=base.shape)
    pkl = Path(td) / f"train_{nev}_{ndim}_{nobs}.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({
            str(i): {"parameter": design[i], "obs": np.stack([noisy[i], err[i]])}
            for i in range(nev)
        }, f)
    parfile = Path(td) / f"pars_{ndim}.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(ndim)))
    truth = rng.uniform(0.35, 0.65, size=ndim)
    exp_mean = 2.0 + np.sin(truth @ freqs) + 0.3 * (truth**2) @ freqs
    exp_pkl = Path(td) / f"exp_{nev}_{ndim}_{nobs}.pkl"
    with open(exp_pkl, "wb") as f:
        pickle.dump(
            {"0": {"obs": np.stack([exp_mean, 0.03 * np.abs(exp_mean)])}}, f
        )
    return str(pkl), str(parfile), str(exp_pkl), truth


def main():
    from gpbayestools_hic_tpu.config import enable_compilation_cache
    from gpbayestools_hic_tpu.models import Emulator, EmulatorBAND
    from gpbayestools_hic_tpu.models.validation import validate_emulator
    from gpbayestools_hic_tpu.samplers import Chain
    from gpbayestools_hic_tpu.utils import delta_d, generate_posterior_clusters
    from gpbayestools_hic_tpu.utils.metrics import effective_sample_size

    enable_compilation_cache()
    td = tempfile.mkdtemp(prefix="baseline_cfgs_")
    results = {}

    # ---- config 1: sklearn-GP baseline, Matern, 5 params / 50 points ----
    t0 = time.perf_counter()
    pkl, parfile, exp_pkl, truth = make_problem(td, 50, 5, 8, seed=1)
    emu1 = Emulator(pkl, parfile, npc=4)
    emu1.trainEmulator(np.ones(emu1.nev, dtype=bool), kernel_type="Matern")
    res1 = validate_emulator(
        Emulator(pkl, parfile, npc=4), n_test_points=10, kernel_type="Matern"
    )
    results["1_sklearn_matern_toy"] = {
        "seconds": round(time.perf_counter() - t0, 2),
        "mean_E": round(res1["mean_E"], 4),
        "mean_log_H": round(res1["mean_log_H"], 3),
    }
    log("config 1:", results["1_sklearn_matern_toy"])

    # ---- config 2: PCGP on a 500-pt LHD design -------------------------
    t0 = time.perf_counter()
    pkl, parfile, exp_pkl, truth = make_problem(td, 500, 8, 24, seed=2)
    res2 = validate_emulator(
        EmulatorBAND(pkl, parfile, method="PCGP"), n_test_points=50
    )
    results["2_pcgp_500pt"] = {
        "seconds": round(time.perf_counter() - t0, 2),
        "mean_E": round(res2["mean_E"], 4),
        "mean_log_H": round(res2["mean_log_H"], 3),
    }
    log("config 2:", results["2_pcgp_500pt"])

    # ---- config 3: PCSK + closure validation ---------------------------
    t0 = time.perf_counter()
    pkl, parfile, exp_pkl, truth = make_problem(td, 300, 6, 16, seed=3,
                                                noise=0.03)
    res3 = validate_emulator(
        EmulatorBAND(pkl, parfile, method="PCSK"), n_test_points=30
    )
    results["3_pcsk_closure"] = {
        "seconds": round(time.perf_counter() - t0, 2),
        "mean_E": round(res3["mean_E"], 4),
        "mean_log_H": round(res3["mean_log_H"], 3),
    }
    log("config 3:", results["3_pcsk_closure"])

    # ---- config 4: ensemble MCMC (200 walkers) + PTLMC ladder ----------
    t0 = time.perf_counter()
    pkl, parfile, exp_pkl, truth = make_problem(td, 200, 6, 16, seed=4)
    emu4 = Emulator(pkl, parfile, npc=4)
    emu4.trainEmulatorAutoMask()

    chain4 = Chain(mcmc_path=str(Path(td) / "m4" / "c.pkl"),
                   expdata_path=exp_pkl, model_parafile=parfile)
    chain4.loadEmulator([emu4])
    chain4.run_mcmc(nsteps=500, nburnsteps=400, nwalkers=200, nthin=1, seed=0)
    ess = effective_sample_size(chain4.chain[:, 100:, :])
    dd_ens = delta_d(chain4.chain[:, 100:, :], truth,
                     np.zeros(6), np.ones(6))
    chain4b = Chain(mcmc_path=str(Path(td) / "m4" / "p.pkl"),
                    expdata_path=exp_pkl, model_parafile=parfile)
    chain4b.loadEmulator([emu4])
    chain4b.run_MCMC_PTLMC(nsteps=300, nwalkers=16, ntemps=20, maxtemp=50,
                           nstartparameters=500)
    dd_ptl = delta_d(chain4b.chain[:, 100:, :], truth,
                     np.zeros(6), np.ones(6))
    results["4_ensemble_plus_ptlmc"] = {
        "seconds": round(time.perf_counter() - t0, 2),
        "ensemble_ess": round(float(ess), 1),
        "delta_d_ensemble": round(dd_ens, 4),
        "delta_d_ptlmc": round(dd_ptl, 4),
    }
    log("config 4:", results["4_ensemble_plus_ptlmc"])

    # ---- config 5: full pipeline SMC + posterior clusters --------------
    t0 = time.perf_counter()
    chain5 = Chain(mcmc_path=str(Path(td) / "m5" / "c.pkl"),
                   expdata_path=exp_pkl, model_parafile=parfile)
    chain5.loadEmulator([emu4])
    out = chain5.run_pocoMC(n_effective=500, n_active=250, n_prior=1000,
                            n_max_steps=30, n_total=4000, n_evidence=1000)
    dd_smc = delta_d(out["chain"], truth, np.zeros(6), np.ones(6))
    centers, _ = generate_posterior_clusters(
        chain5.mcmc_path, n_clusters=3, n_top_samples=1000,
        output_dir=Path(td) / "m5",
    )
    results["5_smc_full_pipeline"] = {
        "seconds": round(time.perf_counter() - t0, 2),
        "logz": round(out["logz"], 2),
        "logz_err": round(out["logz_err"], 3),
        "delta_d_smc": round(dd_smc, 4),
        "n_clusters": len(centers),
    }
    log("config 5:", results["5_smc_full_pipeline"])

    with open("baseline_configs.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    # closure sanity across samplers: all Delta_d small
    ok = (results["4_ensemble_plus_ptlmc"]["delta_d_ensemble"] < 0.1
          and results["4_ensemble_plus_ptlmc"]["delta_d_ptlmc"] < 0.1
          and results["5_smc_full_pipeline"]["delta_d_smc"] < 0.1)
    log("BASELINE CONFIGS:", "ALL PASS" if ok else "CHECK delta_d")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
