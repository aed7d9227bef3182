"""Full-pipeline Bayesian calibration with all three samplers.

Mirror of RunBayesianAnalysis.ipynb (SURVEY.md C22): load the per-group
emulators, build the Chain, and run the recommended flow-preconditioned SMC
(pocoMC semantics), the ensemble sampler, or PTLMC.  Run
``make_synthetic_dataset.py`` and ``emulator_training.py`` first.
"""

import sys
from pathlib import Path

from gpbayestools_hic_tpu.samplers import Chain

DATA = Path("synthetic_data")
GROUPS = ("dNdy", "meanpT", "vn")


def build_chain(mcmc_name: str) -> Chain:
    chain = Chain(
        mcmc_path=str(DATA / "mcmc" / mcmc_name),
        expdata_path=str(DATA / "exp_data.pkl"),
        model_parafile=str(DATA / "model_params.txt"),
    )
    chain.loadEmulator(
        [str(DATA / f"emulator_sklearn_{g}.sav") for g in GROUPS]
    )
    return chain


def main(sampler: str = "pocoMC", devices: int | None = None, **overrides):
    # sampler: pocoMC | emcee | PTLMC | HMC.  devices=N shards the
    # walker/particle axis over the first N accelerator chips (the
    # reference's pool=12 ergonomics, now a device count).  Keyword
    # overrides are forwarded to the sampler call (e.g. smaller sizes for
    # a smoke run).
    if sampler == "pocoMC":  # recommended (reference cell 4)
        chain = build_chain("chain_smc.pkl")
        kwargs = dict(
            n_effective=1000, n_active=500, n_prior=2000,
            sample="tpcn", n_max_steps=50, n_total=8000, n_evidence=2000,
            devices=devices,
        )
        chain.run_pocoMC(**{**kwargs, **overrides})
    elif sampler == "emcee":  # reference cell 5
        chain = build_chain("chain_ensemble.pkl")
        kwargs = dict(nsteps=1000, nburnsteps=1000, nwalkers=100, nthin=2,
                      devices=devices)
        chain.run_mcmc(**{**kwargs, **overrides})
    elif sampler == "PTLMC":  # reference cell 6
        chain = build_chain("chain_ptlmc.pkl")
        kwargs = dict(nsteps=1000, nwalkers=16, ntemps=30,
                      maxtemp=100, devices=devices)
        chain.run_MCMC_PTLMC(**{**kwargs, **overrides})
    elif sampler == "HMC":  # beyond-reference: gradient-based, near-iid
        chain = build_chain("chain_hmc.pkl")
        # n_leapfrog="auto" calibrates the trajectory length per posterior;
        # scheme="windowed" (Neal-windowed trajectory sampling) is the
        # measured production pick: ~8% more ESS/s than endpoint
        # Metropolis at the same gradient cost on the flagship posterior.
        # persist=0.7 (Horowitz partial momentum refresh) adds another
        # ~8-10% WHEN acceptance adapts high (~0.85+); rejections reverse
        # the persistent momentum, so drop it to 0.0 if acceptance is low.
        kwargs = dict(nsteps=500, nwalkers=64, nburnsteps=128,
                      n_leapfrog="auto", scheme="windowed", persist=0.7,
                      devices=devices)
        chain.run_MCMC_HMC(**{**kwargs, **overrides})
    else:
        raise SystemExit(f"unknown sampler {sampler}")
    if sampler != "pocoMC":  # weighted SMC posteriors have no walker-time axis
        chain.convergence_report()
    print(f"{sampler} chain written under {DATA / 'mcmc'}")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "pocoMC",
        int(sys.argv[2]) if len(sys.argv) > 2 else None,
    )
