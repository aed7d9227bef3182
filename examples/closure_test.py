"""Closure test: does the posterior contain the known truth?

Mirror of ClosureTest.ipynb + the Delta_d metric of PlotMCMC.ipynb cells
18-19 (SURVEY.md C23/C25).  Run the full pipeline examples first.
"""

import pickle
from pathlib import Path

import numpy as np

from gpbayestools_hic_tpu.models import Emulator
from gpbayestools_hic_tpu.utils import (
    delta_d,
    percentile_params,
    posterior_predictive,
)
from gpbayestools_hic_tpu.utils.plotting import (
    corner_plot,
    observables_plot,
    trace_plot,
)

DATA = Path("synthetic_data")
GROUPS = ("dNdy", "meanpT", "vn")


def main():
    truth = np.loadtxt(DATA / "truth_parameters.txt")
    with open(DATA / "mcmc" / "chain_smc.pkl", "rb") as f:
        chain_data = pickle.load(f)
    chain = chain_data["chain"]
    # the SMC chain is the WEIGHTED persistent-sampling history: every
    # metric/plot must consume the weights or it summarizes the prior-
    # contaminated mixture instead of the posterior
    weights = chain_data.get("weights")

    pct = percentile_params(chain, weights=weights)
    print("16/50/84 percentiles:\n", np.round(pct, 3))
    # prior bounds from the SAME parameter file the rest of the pipeline
    # reads -- hardcoded [0, 1] would silently mis-normalize Delta_d when
    # this script is adapted to a dataset with other ranges
    from gpbayestools_hic_tpu import parse_model_parameter_file

    pars = parse_model_parameter_file(DATA / "model_params.txt")
    lo = np.array([v[1] for v in pars.values()])
    hi = np.array([v[2] for v in pars.values()])
    dd = delta_d(chain, truth, lo, hi, weights=weights)
    print(f"closure metric Delta_d = {dd:.4f} (small is good)")

    emus = [
        Emulator.load(DATA / f"emulator_sklearn_{g}.sav") for g in GROUPS
    ]
    preds = posterior_predictive(chain, emus, n_draws=15, weights=weights)
    with open(DATA / "exp_data.pkl", "rb") as f:
        exp = pickle.load(f)["0"]["obs"]
    observables_plot(preds, exp[0], exp[1], fig_path=DATA / "closure_ppc.png")
    trace_plot(chain, weights=weights, fig_path=DATA / "trace.png")
    corner_plot(chain, truths=truth, weights=weights,
                fig_path=DATA / "corner.png")
    print(f"plots written to {DATA}/")


if __name__ == "__main__":
    main()
