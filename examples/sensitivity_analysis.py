"""Sensitivity analysis: normalized response matrix d lnY / d ln theta.

Mirror of SensitivityAnalysis.ipynb (SURVEY.md C24), with exact forward-mode
autodiff replacing the reference's finite differences.  Run
``make_synthetic_dataset.py`` + ``emulator_training.py`` first.
"""

from pathlib import Path

import numpy as np

from gpbayestools_hic_tpu.models import Emulator
from gpbayestools_hic_tpu.utils import sensitivity_matrix, sensitivity_matrix_fd

DATA = Path("synthetic_data")


def main(group: str = "dNdy"):
    emu = Emulator.load(DATA / f"emulator_sklearn_{group}.sav")
    theta = np.full(len(emu.pardict), 0.5)
    s_ad = sensitivity_matrix(emu, theta)
    s_fd = sensitivity_matrix_fd(emu, theta)
    print("autodiff response matrix (nobs x ndim):\n", np.round(s_ad, 3))
    print("max |AD - FD(h=0.1)| =", np.abs(s_ad - s_fd).max().round(4))


if __name__ == "__main__":
    main()
