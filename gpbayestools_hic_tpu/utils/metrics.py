"""Validation metrics as library functions.

The reference defines its two emulator-validation metrics inside
``EmulatorValidation.ipynb`` cell 2 and its closure metric inside
``PlotMCMC.ipynb`` cells 18-19 (SURVEY.md C21/C25); here they are proper
functions:

- :func:`rms_relative_error` -- "E": RMS relative prediction error per
  observable;
- :func:`honesty` -- "H": RMS of (prediction error / claimed sigma), the
  calibration of the emulator's claimed uncertainty (H ~ 1 is honest);
- :func:`delta_d` -- closure-test metric
  ``Delta_d = E[sum((theta - theta_truth)^2 / width^2)] / ndim``;
- :func:`coverage` -- fraction of truths inside the central credible
  interval of each claimed Gaussian.
"""

from __future__ import annotations

import numpy as np


def rms_relative_error(pred: np.ndarray, truth: np.ndarray, axis=0) -> np.ndarray:
    """E: RMS of (pred - truth)/truth over samples (per observable)."""
    rel = (np.asarray(pred) - np.asarray(truth)) / np.asarray(truth)
    return np.sqrt(np.mean(rel**2, axis=axis))


def honesty(pred: np.ndarray, pred_err: np.ndarray, truth: np.ndarray, axis=0) -> np.ndarray:
    """H: RMS of (pred - truth)/sigma_pred.  H >> 1: overconfident;
    H << 1: underconfident; H ~ 1: honest uncertainties."""
    z = (np.asarray(pred) - np.asarray(truth)) / np.asarray(pred_err)
    return np.sqrt(np.mean(z**2, axis=axis))


def mean_log_honesty(pred, pred_err, truth) -> float:
    """<log H> averaged over observables (EmulatorValidation.ipynb cell 19)."""
    h = honesty(pred, pred_err, truth)
    return float(np.mean(np.log(h)))


def delta_d(chain: np.ndarray, truth: np.ndarray, prior_min: np.ndarray,
            prior_max: np.ndarray, weights: np.ndarray | None = None) -> float:
    """Closure metric Delta_d (PlotMCMC.ipynb cells 18-19).

    ``chain``: posterior samples (..., ndim) (any leading shape).
    ``weights``: optional per-sample importance weights (the SMC sampler's
    persistent-sampling posterior is weighted).
    Returns ``E_samples[ sum_d ((theta_d - truth_d)/width_d)^2 ] / ndim``.
    """
    samples = np.asarray(chain).reshape(-1, len(truth))
    width = np.asarray(prior_max) - np.asarray(prior_min)
    z2 = ((samples - np.asarray(truth)) / width) ** 2
    if weights is not None:
        weights = np.asarray(weights).reshape(-1)
    return float(np.average(np.sum(z2, axis=1), weights=weights) / len(truth))


def coverage(pred, pred_err, truth, n_sigma: float = 1.0) -> float:
    """Fraction of truths within +- n_sigma of the claimed Gaussian."""
    z = np.abs((np.asarray(pred) - np.asarray(truth)) / np.asarray(pred_err))
    return float(np.mean(z < n_sigma))


def integrated_autocorr_time(
    chain_1d_batch: np.ndarray, reliable_factor: float = 50.0,
    return_converged: bool = False,
):
    """emcee-style integrated autocorrelation time for one parameter.

    ``chain_1d_batch`` (nwalkers, nsteps): FFT autocorrelation averaged over
    walkers with Sokal's adaptive window (c = 5).  Fully stuck walkers are
    excluded.  Returns tau >= 1.

    The windowed estimator is biased LOW when the chain is short: it can
    only see correlations up to the window, so tau keeps growing as you
    feed it longer chains until ``nsteps >> tau`` (measured on the flagship
    posterior: the DE move's tau read 22.5/38.9/61.3/86.5 at
    256/512/1024/2048 steps).  Following emcee's convention the estimate is
    flagged unreliable when ``nsteps < reliable_factor * tau``.  With
    ``return_converged=True`` returns ``(tau, converged)``; otherwise an
    unreliable estimate emits a ``RuntimeWarning`` (treat the tau as a
    lower bound and any derived ESS as an upper bound).
    """
    import warnings

    x = np.asarray(chain_1d_batch, dtype=np.float64)
    x = x - x.mean(axis=1, keepdims=True)
    alive = x.var(axis=1) > 0
    if not alive.any():
        # EVERY walker frozen: the sampler never moved, so tau is infinite
        # (returning the tau >= 1 floor here would report maximal ESS for
        # a completely stuck chain -- the exact failure this diagnostic
        # exists to catch)
        warnings.warn(
            "all walkers have zero variance (fully stuck chain): tau is "
            "infinite and the ESS is zero",
            RuntimeWarning, stacklevel=2,
        )
        return (np.inf, False) if return_converged else np.inf
    x = x[alive]
    n = x.shape[1]
    nfft = 1 << (2 * n - 1).bit_length()
    f = np.fft.rfft(x, n=nfft, axis=1)
    acf = np.fft.irfft(f * np.conj(f), n=nfft, axis=1)[:, :n].real
    acf /= np.maximum(acf[:, :1], 1e-30)
    rho = acf.mean(axis=0)
    taus = 2.0 * np.cumsum(rho) - 1.0
    window = np.arange(len(taus)) < 5.0 * taus
    idx = np.argmin(window) if not window.all() else len(taus) - 1
    tau = float(max(taus[min(idx, len(taus) - 1)], 1.0))
    converged = n >= reliable_factor * tau
    if return_converged:
        return tau, converged
    if not converged:
        warnings.warn(
            f"tau estimate {tau:.1f} from only {n} steps "
            f"(< {reliable_factor:g} tau): treat it as a lower bound",
            RuntimeWarning, stacklevel=2,
        )
    return tau


def effective_sample_size(chain: np.ndarray) -> float:
    """ESS of a (nwalkers, nsteps, ndim) chain: nwalkers*nsteps / max_d tau_d."""
    chain = np.asarray(chain)
    taus = [integrated_autocorr_time(chain[:, :, d]) for d in range(chain.shape[-1])]
    return chain.shape[0] * chain.shape[1] / max(taus)
