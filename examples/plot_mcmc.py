"""Posterior plotting & closure metrics for saved chains.

Mirror of PlotMCMC.ipynb (SURVEY.md C25): per-parameter trace histograms
(cell 3), corner plots with truth overlays (cells 4-5), multi-sampler
posterior comparison (cell 6), 16/50/84-percentile extraction (cell 7), the
closure metric Delta_d (cells 18-19), and 68/95/99.7% posterior bands of a
viscosity-style parametric curve (cells 37-42).

Consumes whichever chains ``run_bayesian_analysis.py`` has produced (SMC /
ensemble / PTLMC); the SMC chain carries importance weights
(persistent-sampling posterior) which every plot and metric here uses.
"""

import pickle
from pathlib import Path

import numpy as np

from gpbayestools_hic_tpu.models.param_pca import eta_over_s_vs_mu_B
from gpbayestools_hic_tpu.utils import delta_d, percentile_params
from gpbayestools_hic_tpu.utils.plotting import (
    corner_plot,
    posterior_band_plot,
    trace_plot,
)

DATA = Path("synthetic_data")
CHAIN_FILES = {  # sampler name -> pickle written by run_bayesian_analysis.py
    "SMC": "chain_smc.pkl",
    "ensemble": "chain_ensemble.pkl",
    "PTLMC": "chain_ptlmc.pkl",
    "HMC": "chain_hmc.pkl",
}


def load_chains():
    """Load every chain pickle that exists; returns {name: (flat, weights)}.

    Unweighted (walker-structured) chains also get an arviz-style summary
    table printed -- mean/sd/CI plus split-R-hat and tau per parameter.
    """
    from gpbayestools_hic_tpu.utils.metrics import summary

    chains = {}
    for name, fname in CHAIN_FILES.items():
        path = DATA / "mcmc" / fname
        if not path.exists():
            continue
        with open(path, "rb") as f:
            data = pickle.load(f)
        arr = np.asarray(data["chain"])
        flat = arr.reshape(-1, arr.shape[-1])
        if data.get("weights") is None and arr.ndim == 3 and arr.shape[1] >= 4:
            print(f"[{name}] posterior summary:\n{summary(arr)}")
        chains[name] = (flat, data.get("weights"))
    if not chains:
        raise SystemExit(
            "no chains found -- run examples/run_bayesian_analysis.py first"
        )
    return chains


def main():
    truth = np.loadtxt(DATA / "truth_parameters.txt")
    ndim = truth.size
    labels = [f"$p_{d}$" for d in range(ndim)]
    # prior bounds from the pipeline's own parameter file (hardcoded
    # [0, 1] would silently mis-normalize Delta_d on other datasets)
    from gpbayestools_hic_tpu import parse_model_parameter_file

    pars = parse_model_parameter_file(DATA / "model_params.txt")
    lo = np.array([v[1] for v in pars.values()])
    hi = np.array([v[2] for v in pars.values()])
    chains = load_chains()

    # percentile extraction + closure metric per sampler (cells 7, 18-19)
    for name, (flat, w) in chains.items():
        pct = percentile_params(flat, weights=w)
        dd = delta_d(flat, truth, lo, hi, weights=w)
        print(f"[{name}] 16/50/84 percentiles:\n{np.round(pct, 3)}")
        print(f"[{name}] closure metric Delta_d = {dd:.4f} (small is good)")

    # trace histograms of the first chain (cell 3)
    first = next(iter(chains))
    flat, w = chains[first]
    trace_plot(flat, labels=labels, weights=w,
               fig_path=DATA / "plot_trace.png")

    # corner: every available sampler overlaid + truth markers (cells 4-6)
    corner_plot(
        [c for c, _ in chains.values()],
        labels=labels,
        chain_names=list(chains),
        truths=truth,
        weights=[w for _, w in chains.values()],
        fig_path=DATA / "plot_corner.png",
    )

    # posterior band of a parametric curve (cells 37-42).  The synthetic
    # parameter space has no physical viscosity block, so demonstrate the
    # workflow by mapping the first three parameters through the
    # eta/s(mu_B) parametrization -- with a real HIC chain, pass the actual
    # shear indices (the reference's [12, 13, 14]).
    # start strictly above 0: the preserved reference quirk in
    # eta_over_s_vs_mu_B returns eta_4 AT mu_B = 0 exactly (strict-bound
    # branch), which would draw a spurious jump at the left plot edge
    grid = np.linspace(1e-3, 0.6, 100)
    posterior_band_plot(
        eta_over_s_vs_mu_B,
        flat,
        grid,
        param_indices=[0, 1, 2],
        weights=w,
        xlabel=r"$\mu_B$ [GeV]",
        ylabel=r"$\eta/s$",
        truth_params=truth[:3],
        fig_path=DATA / "plot_eta_band.png",
    )
    print(f"plots written to {DATA}/ (trace, corner, eta/s band)")


if __name__ == "__main__":
    main()
