"""PCGP / PCSK / PCGPwImpute emulator heads (surmise-parity API).

Rebuild of the reference's ``EmulatorBAND`` wrapper around surmise 0.2.1
(src/emulator_BAND.py:18-580).  The surmise methods are re-implemented on
the same batched-GP core as the sklearn head:

- **PCGP**: PCA-projected GP -- standardize, whitened PCA keeping enough
  components for ``target_variance`` of the variance, one Matern-1.5 ARD GP
  per kept PC, truncation covariance for the rest.
- **PCSK**: PCGP with *stochastic-kriging* known simulation noise: the
  per-observable, per-design stat errors (``simsd`` in surmise; reference
  src/emulator_BAND.py:276-282) are propagated through the standardization
  + PCA weights into per-(PC, design) noise variances added to each GP's
  Gram diagonal.
- **PCGPwImpute**: missing observables (NaN) are filled by iterative
  low-rank SVD imputation before PCGP training.
- **PCGPwM** ("with Missingness"): imputation plus per-(PC, design) GP
  noise inflation by the imputation uncertainty (the per-column SVD
  reconstruction residual variance propagated through the PCA weights) --
  a genuine missingness-aware head where the reference silently aliases to
  PCGPwImpute (src/emulator_BAND.py:288-292).
- unknown methods raise ``ValueError`` (the reference constructs the error
  but forgets to raise it, src/emulator_BAND.py:293-294 -- fixed here, as
  flagged in SURVEY.md).

API parity with the reference: constructor signature, ``trainEmulator(mask)``
/ ``trainEmulatorAutoMask()``, ``predict(X, return_cov, extra_std)``
returning ``(mean (m, nobs), cov (m, nobs, nobs))``,
``predict_test_emu_errors(x, theta)`` (mean transposed, surmise layout), and
both ``testEmulatorErrors*`` validators.  Since the predictive covariance
keeps the fixed-basis low-rank form, the calibration layer's Woodbury fast
path applies to these heads unchanged.
"""

from __future__ import annotations

import logging
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..ops.scalers import n_components_for_variance
from .emulator import Emulator
from .param_pca import ParamPCAGroup

logger = logging.getLogger(__name__)

_METHODS = ("PCGP", "PCSK", "PCGPwImpute", "PCGPwM")


def _impute_iterative_svd(
    data: np.ndarray, rank: int | None = None, iters: int = 20
):
    """Fill NaNs by iterative low-rank SVD reconstruction.

    Returns ``(filled, mask, col_resid_var)`` where ``col_resid_var`` is the
    per-column reconstruction residual variance on OBSERVED entries -- the
    natural uncertainty estimate for the imputed values."""
    mask = np.isnan(data)
    if not mask.any():
        return data, mask, np.zeros(data.shape[1])
    all_missing = mask.all(axis=0)
    if all_missing.any():
        raise ValueError(
            "imputation needs at least one observed value per observable: "
            f"column(s) {np.flatnonzero(all_missing).tolist()} are NaN for "
            "every event"
        )
    filled = data.copy()
    col_mean = np.nanmean(data, axis=0)
    filled[mask] = np.take(col_mean, np.where(mask)[1])
    r = rank or min(10, min(data.shape) - 1)
    recon = filled
    for _ in range(iters):
        mean = filled.mean(axis=0)
        u, s, vt = np.linalg.svd(filled - mean, full_matrices=False)
        recon = (u[:, :r] * s[:r]) @ vt[:r] + mean
        prev = filled[mask]
        filled[mask] = recon[mask]
        if np.max(np.abs(prev - filled[mask])) < 1e-10:
            break
    resid = np.where(mask, 0.0, data - recon)
    nobs_col = np.maximum((~mask).sum(axis=0), 1)
    col_resid_var = np.where(
        mask.any(axis=0), (resid**2).sum(axis=0) / nobs_col, 0.0
    )
    return filled, mask, col_resid_var


class EmulatorBAND(Emulator):
    """Multidimensional GP emulator with surmise-method heads."""

    def __init__(
        self,
        training_set_path: str = ".",
        parameter_file: str = "ABCD.txt",
        method: str = "PCGP",
        logTrafo: bool = False,
        parameterTrafoPCA: bool = False,
        max_rel_uncertainty_data: float = 0.1,
        exp_and_cov_diagonal: bool = False,
        param_pca_groups: Sequence[ParamPCAGroup] | None = None,
        target_variance: float = 0.99,
        nrestarts: int = 0,
        seed: int = 0,
        gp_maxiter: int = 200,
        kernel_kind: str = "Matern",
        map_prior_strength: float = 0.0,
    ):
        """``kernel_kind``: per-PC GP covariance family -- "Matern"
        (isotropic ARD Matern-1.5, the rebuild default, matching the
        reference sklearn head's non-RBF option) or "MaternProd"
        (surmise's separable product-Matern, see ops/kernels.py).
        ``map_prior_strength``: > 0 switches hyperparameter fitting to the
        MAP objective (surmise's penalized likelihood role; see
        GPConfig.map_prior_strength).  Together these make the two
        documented surmise divergences (docs/SURMISE_PARITY.md items 5-6)
        selectable instead of fixed."""
        if method not in _METHODS:
            raise ValueError(f"Requested method not implemented: {method}")
        if kernel_kind not in ("RBF", "Matern", "MaternProd"):
            raise ValueError(f"Unknown kernel kind: {kernel_kind}")
        self.method_ = method
        self.kernel_kind_ = kernel_kind
        self.gp_map_prior_strength = float(map_prior_strength)
        self.pc_target_variance = target_variance
        super().__init__(
            training_set_path=training_set_path,
            parameter_file=parameter_file,
            npc=10**9,  # resolved by the variance threshold at train time
            nrestarts=nrestarts,
            logTrafo=logTrafo,
            parameterTrafoPCA=parameterTrafoPCA,
            max_rel_uncertainty_data=max_rel_uncertainty_data,
            exp_and_cov_diagonal=exp_and_cov_diagonal,
            perform_no_PCA=False,
            param_pca_groups=param_pca_groups,
            seed=seed,
            gp_maxiter=gp_maxiter,
        )
        # small jitter instead of sklearn's alpha=0.1: PCSK carries the real
        # noise explicitly and PCGP learns its white level
        self.gp_alpha = 1e-6
        self._impute_mask = None
        self._impute_col_var = None
        # training_set_path=None (the base class's data-less shell mode,
        # used by load()) leaves design_points/model_data unset
        if training_set_path is not None:
            # reference parity (src/emulator_BAND.py:46, 70): under
            # parameter-space PCA this is the TRANSFORMED dimension
            self.nparameters = (
                self.PCA_new_design_points.shape[1]
                if self.parameterTrafoPCA_
                else self.design_points.shape[1]
            )
            if method in ("PCGPwImpute", "PCGPwM"):
                # record WHERE data is missing but keep the NaNs in
                # model_data: imputation runs PER FIT on the masked subset
                # (_training_data below), so testEmulatorErrors' holdout
                # rows can never leak into the SVD fill of the training
                # values (the reference imputes inside surmise per fit too)
                self._impute_mask = np.isnan(
                    np.asarray(self.model_data, dtype=np.float64)
                )

    # ---------------------------------------------------------------- hooks

    def _select_npc(self, pca) -> int:
        npc = n_components_for_variance(pca, self.pc_target_variance)
        logger.info(
            "%s keeps %d PCs for %.1f%% of variance",
            self.method_, npc, self.pc_target_variance * 100,
        )
        return npc

    def _pc_noise_diag(self, eventMask, npc_used):
        # host numpy (training prep; see ops/scalers.py on the host/device
        # split) -- gp_fit receives the result as an input array
        mask = np.asarray(eventMask, dtype=bool)
        if self.method_ == "PCSK":
            # standardized stat errors -> PC-space variances:
            # var_z[k, i] = sum_j (W_kj sigma_std_ij)^2,
            # W_kj = components_kj / sqrt(ev_k) (whitened projection weights)
            err_var = np.asarray(self.model_data_err[mask, :], np.float64) ** 2
        elif (
            self.method_ == "PCGPwM"
            and self._impute_mask is not None
            and self._impute_col_var is not None
        ):
            # col_var is set by the per-fit imputation in _training_data;
            # a dataset with no missing entries never sets it (and has
            # nothing to inflate)
            # missingness-aware: imputed entries carry the per-column SVD
            # reconstruction residual variance as known noise
            err_var = np.where(
                self._impute_mask[mask, :], self._impute_col_var[None, :], 0.0
            )
        else:
            return None
        var_std = err_var / np.asarray(self.scaler.scale, np.float64) ** 2
        w = np.asarray(self.pca.components[:npc_used], np.float64) / np.sqrt(
            np.asarray(self.pca.explained_variance[:npc_used], np.float64)
        )[:, None]
        out = (var_std @ (w**2).T).T  # (npc, nev) for gp_fit
        return jnp.asarray(out, dtype=self._dtype)

    # ---------------------------------------------------------------- train

    def _training_data(self, eventMask):
        """Per-fit SVD imputation on exactly the masked subset (see the
        __init__ note).  A loaded legacy save whose model_data was already
        imputed has no NaNs left, so the fill is skipped and the loaded
        ``_impute_col_var`` keeps serving the wM noise diag."""
        if self.method_ in ("PCGPwImpute", "PCGPwM"):
            raw = np.asarray(self.model_data, dtype=np.float64)[
                np.asarray(eventMask, dtype=bool)
            ]
            if np.isnan(raw).any():
                filled, _, self._impute_col_var = _impute_iterative_svd(raw)
                return filled
        return super()._training_data(eventMask)

    def trainEmulator(self, event_mask, kernel_type: str | None = None):
        super().trainEmulator(
            event_mask,
            kernel_type=kernel_type or getattr(self, "kernel_kind_", "Matern"),
        )

    # ------------------------------------------------------------- predict

    def predict_test_emu_errors(self, X, theta):
        """Surmise-layout predict: returns (mean (nobs, m), cov (m, nobs, nobs)).

        ``X`` is the surmise observable-index grid and is ignored (kept for
        reference API parity, src/emulator_BAND.py:297-383).
        """
        mean, cov = self.predict(theta, return_cov=True)
        return mean.T, cov

    # ---------------------------------------------------------- validation

    def testEmulatorErrors(self, number_test_points: int = 1):
        return super().testEmulatorErrors(
            nTestPoints=number_test_points,
            kernel_type=getattr(self, "kernel_kind_", "Matern"),
        )

    def testEmulatorErrorsWithTrainingPoints(self, number_test_points: int = 1):
        return super().testEmulatorErrorsWithTrainingPoints(
            nTestPoints=number_test_points,
            kernel_type=getattr(self, "kernel_kind_", "Matern"),
        )
