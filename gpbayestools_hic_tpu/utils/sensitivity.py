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
    (SensitivityAnalysis.ipynb cell 4).  Returns (nobs, ndim).

    Implements the reference's exact estimator
    ``(Y1 - Y2) / (2h) * theta_d / mean(Y1, Y2)`` -- finite for
    ``theta_d <= 0`` (h = rel_step * |theta_d|, with an absolute floor so
    a zero parameter still gets a step) and with no logs of theta.  For a
    ``logTrafo`` emulator ``predict`` returns ln Y, so
    ``d lnY / d ln theta`` is the raw difference quotient times theta --
    dividing by the log-space mean would compute d ln(lnY) and blow up
    near Y = 1 (the same special case as :func:`sensitivity_matrix`)."""
    theta = np.asarray(theta, dtype=float)
    ndim = theta.shape[0]
    log_trafo = bool(getattr(emulator, "logTrafo_", False)) and not bool(
        getattr(emulator, "exp_and_cov_diagonal_", False)
    )
    base = emulator.predict(theta[None, :], return_cov=False)[0]
    out = np.empty((base.shape[0], ndim))
    for d in range(ndim):
        h = rel_step * max(abs(theta[d]), 1e-8)
        up = theta.copy()
        dn = theta.copy()
        up[d] += h
        dn[d] -= h
        y_up = emulator.predict(up[None, :], return_cov=False)[0]
        y_dn = emulator.predict(dn[None, :], return_cov=False)[0]
        slope = (y_up - y_dn) / (2.0 * h)
        if log_trafo:
            out[:, d] = slope * theta[d]
        else:
            out[:, d] = slope * theta[d] / (0.5 * (y_up + y_dn))
    return out
