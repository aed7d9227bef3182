"""Sensitivity analysis of emulated observables to model parameters.

The reference computes a normalized central-difference response matrix
``d lnY / d ln theta`` with h = 0.1 theta via two emulator predicts per
parameter (SensitivityAnalysis.ipynb cell 4; SURVEY.md C24).  Here the
primary implementation is exact forward-mode autodiff straight through the
jitted emulator predict (one pass, no step-size tuning); the reference's
finite-difference scheme is kept for cross-checking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sensitivity_matrix(emulator, theta: np.ndarray) -> np.ndarray:
    """Exact normalized sensitivities S[j, d] = d ln Y_j / d ln theta_d.

    Uses ``jax.jacfwd`` through the emulator's pure predict program at the
    single point ``theta`` (ndim,).  Returns (nobs, ndim).
    """
    theta = jnp.asarray(theta, dtype=emulator._dtype)
    state = emulator.predict_state
    fn = emulator.predict_pc_pure

    def mean_fn(t):
        mean, _ = fn(state, t[None, :])
        return mean[0]

    jac = jax.jacfwd(mean_fn)(theta)          # (nobs, ndim)
    if getattr(emulator, "logTrafo_", False):
        # the emulator already predicts ln Y, so d lnY/d ln theta is just
        # the Jacobian times theta -- no division (dividing by the log-space
        # mean would compute d ln(lnY) and blow up near Y = 1)
        return np.asarray(jac * theta[None, :])
    mean = mean_fn(theta)                      # (nobs,)
    return np.asarray(jac * theta[None, :] / mean[:, None])


def sensitivity_matrix_fd(
    emulator, theta: np.ndarray, rel_step: float = 0.1
) -> np.ndarray:
    """Reference-style central differences with h = rel_step * theta
    (SensitivityAnalysis.ipynb cell 4).  Returns (nobs, ndim)."""
    theta = np.asarray(theta, dtype=float)
    ndim = theta.shape[0]
    base = emulator.predict(theta[None, :], return_cov=False)[0]
    out = np.empty((base.shape[0], ndim))
    for d in range(ndim):
        h = rel_step * theta[d]
        up = theta.copy()
        dn = theta.copy()
        up[d] += h
        dn[d] -= h
        y_up = emulator.predict(up[None, :], return_cov=False)[0]
        y_dn = emulator.predict(dn[None, :], return_cov=False)[0]
        out[:, d] = (np.log(np.abs(y_up)) - np.log(np.abs(y_dn))) / (
            np.log(up[d]) - np.log(dn[d])
        )
    return out
