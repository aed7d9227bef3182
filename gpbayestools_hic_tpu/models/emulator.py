"""PCA-projected multi-output Gaussian-process emulator (sklearn-parity head).

API- and semantics-parity rebuild of the reference ``Emulator``
(src/emulator.py:23-726) with TPU-native internals:

- training data standardized, projected through whitened full-SVD PCA, and
  the first ``npc`` PCs each emulated by an independent GP -- but the per-PC
  sklearn ``GPR.fit`` loop (src/emulator.py:309-315) becomes ONE vmapped
  batched fit (:func:`..models.gp.gp_fit`), and
- ``predict`` -- parameter-PCA transform, batched GP posterior, inverse PCA
  transform, and linear uncertainty propagation -- is a single jitted device
  program instead of a chain of per-GP numpy calls
  (src/emulator.py:465-605).

Reference quirks deliberately preserved: truncation covariance for neglected
PCs with the ``1e-4 * scaler.var_`` diagonal stabilizer
(src/emulator.py:359-363); predictive covariance includes the white-noise
level but not alpha; ``exp_and_cov_diagonal`` exponentiates the mean and
rebuilds a diagonal covariance ``(fstd * mean)^2`` (src/emulator.py:594-601).
Fixed (flagged in SURVEY.md): unknown kernel types raise instead of logging
and falling through (src/emulator.py:298-299).
"""

from __future__ import annotations

import logging
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import working_dtype
from ..ops.kernels import KernelConfig
from ..ops.scalers import (
    fit_pca,
    fit_standard_scaler,
    pca_transform,
    scaler_transform,
)
from ..runtime import parse_model_parameter_file
from ..utils.io import load_training_pickle, load_pytree, save_pytree
from .gp import GPConfig, GPState, gp_fit, gp_predict, gp_sample
from .param_pca import (
    ParamPCAGroup,
    ParamPCAState,
    apply_param_pca,
    apply_param_pca_packed,
    default_groups,
    fit_param_pca,
    pack_param_pca,
)

logger = logging.getLogger(__name__)


class Emulator:
    """Multidimensional GP emulator with optional PCA projection.

    Constructor signature mirrors the reference (src/emulator.py:50-53) plus
    TPU-specific extras (``param_pca_groups`` lifts the reference's hardcoded
    viscosity indices into config; ``seed`` controls restart sampling).
    """

    def __init__(
        self,
        training_set_path: str = ".",
        parameter_file: str = "ABCD.txt",
        npc: int = 10,
        nrestarts: int = 0,
        logTrafo: bool = False,
        parameterTrafoPCA: bool = False,
        max_rel_uncertainty_data: float = 0.1,
        exp_and_cov_diagonal: bool = False,
        perform_no_PCA: bool = False,
        param_pca_groups: Sequence[ParamPCAGroup] | None = None,
        seed: int = 0,
        gp_maxiter: int = 200,
    ):
        self.gp_maxiter = gp_maxiter
        self.logTrafo_ = logTrafo
        self.parameterTrafoPCA_ = parameterTrafoPCA
        self.max_rel_uncertainty_data_ = max_rel_uncertainty_data
        self.exp_and_cov_diagonal_ = exp_and_cov_diagonal
        if not self.logTrafo_ and self.exp_and_cov_diagonal_:
            raise ValueError(
                "exp_and_cov_diagonal can only be set to True if logTrafo is True."
            )
        self.perform_no_PCA_ = perform_no_PCA
        self.npc = npc
        self.nrestarts = nrestarts
        self.seed = seed
        self.gp_alpha = 0.1  # sklearn GPR alpha (reference: src/emulator.py:310)
        self._dtype = working_dtype()

        if training_set_path is not None:
            td = load_training_pickle(
                training_set_path,
                max_rel_uncertainty=max_rel_uncertainty_data,
                log_trafo=logTrafo,
            )
            self.design_points = td.design_points
            self.design_points_org_ = td.design_points_org
            self.model_data = td.model_data
            self.model_data_err = td.model_data_err
            self.nev, self.nobs = self.model_data.shape

        self.pardict = parse_model_parameter_file(parameter_file)
        self.design_min = np.array([v[1] for v in self.pardict.values()])
        self.design_max = np.array([v[2] for v in self.pardict.values()])

        self.param_pca_groups = (
            list(param_pca_groups) if param_pca_groups is not None else default_groups()
        )
        self.param_pca_state: ParamPCAState | None = None
        if self.parameterTrafoPCA_:
            self.targetVariance = 0.99
            logger.info("Preparing parameter-space PCA ...")
            (
                self.param_pca_state,
                self.PCA_new_design_points,
                self.design_min,
                self.design_max,
            ) = fit_param_pca(
                self.design_points,
                self.design_min,
                self.design_max,
                self.param_pca_groups,
                target_variance=self.targetVariance,
            )

        self._trained = False

    # ------------------------------------------------- parametrizations
    # Reference API parity: the viscosity curve functions are methods on the
    # reference Emulator (src/emulator.py:102-126).  These delegate to the
    # vectorized module-level implementations and accept scalars.

    def parametrization_zeta_over_s_vs_T(self, zeta_max, T_zeta0, sigma_plus,
                                         sigma_minus, T, mu_B):
        from .param_pca import zeta_over_s_vs_T

        out = zeta_over_s_vs_T(
            jnp.asarray([[zeta_max, T_zeta0, sigma_plus, sigma_minus]]),
            jnp.asarray(T), mu_B,
        )
        return float(out.reshape(-1)[0]) if jnp.ndim(jnp.asarray(T)) == 0 else out[0]

    def parametrization_eta_over_s_vs_mu_B(self, eta_0, eta_2, eta_4, mu_B):
        from .param_pca import eta_over_s_vs_mu_B

        out = eta_over_s_vs_mu_B(
            jnp.asarray([[eta_0, eta_2, eta_4]]), jnp.asarray(mu_B)
        )
        return float(out.reshape(-1)[0]) if jnp.ndim(jnp.asarray(mu_B)) == 0 else out[0]

    def parametrization_y_loss_vs_y_init(self, yloss_2, yloss_4, yloss_6, y_init):
        from .param_pca import y_loss_vs_y_init

        out = y_loss_vs_y_init(
            jnp.asarray([[yloss_2, yloss_4, yloss_6]]), jnp.asarray(y_init)
        )
        return float(out.reshape(-1)[0]) if jnp.ndim(jnp.asarray(y_init)) == 0 else out[0]

    # ------------------------------------------------------------------ train

    def trainEmulatorAutoMask(self):
        self.trainEmulator(np.ones(self.nev, dtype=bool))

    def _training_data(self, eventMask):
        """Masked training matrix; subclass hook.  The BAND impute heads
        fill NaNs PER FIT on exactly this subset -- imputing once over all
        events would leak testEmulatorErrors' holdout rows into the SVD
        fill of the training values."""
        return self.model_data[np.asarray(eventMask, dtype=bool), :]

    def _prepare_training(self, eventMask, kernel_type: str):
        """Stage 1 of training: fit scaler/PCA, build GP targets.

        Returns ``(design (nev, d), z_t (npc_used, nev), ptp (d,),
        noise_diag or None)``; sets scaler/pca/_npc_used/gp_config.
        """
        if kernel_type not in ("RBF", "Matern", "MaternProd"):
            raise ValueError(f"Unknown kernel type: {kernel_type}")
        eventMask = np.asarray(eventMask, dtype=bool)
        dtype = self._dtype
        # Training prep runs on the HOST: fit/transform are one-time numpy
        # work (see ops/scalers.py), and on this runtime every eager device
        # op pays a multi-second remote compile -- only gp_fit and the fused
        # predict programs belong on the device.
        np_dtype = np.dtype(dtype)
        data = np.asarray(self._training_data(eventMask), dtype=np_dtype)

        self.scaler = fit_standard_scaler(data)
        standardized = scaler_transform(self.scaler, data)

        if self.perform_no_PCA_:
            logger.info("Skipping PCA. Using raw standardized data for GP training ...")
            z = standardized
            npc_used = self.nobs
            self.pca = None
        else:
            logger.info("Standardizing data and performing PCA ...")
            self.pca = fit_pca(standardized, whiten=True)
            npc_used = self._select_npc(self.pca)
            z = pca_transform(self.pca, standardized, npc=npc_used)
            logger.info(
                "%d PCs explain %.5f of variance",
                npc_used,
                float(np.sum(self.pca.explained_variance_ratio[:npc_used])),
            )
        self._npc_used = npc_used

        design = (
            self.PCA_new_design_points if self.parameterTrafoPCA_ else self.design_points
        )[eventMask, :]
        design = jnp.asarray(design, dtype=dtype)
        ptp_np = np.asarray(self.design_max) - np.asarray(self.design_min)
        if np.any(ptp_np <= 0):
            # log(0) length-scale init would silently propagate NaN through
            # the whole GP state (gp_fit is jitted and cannot raise on
            # values); name the offending parameters here instead
            names = list(self.pardict.keys())
            bad = [
                names[i] if i < len(names) else f"column {i}"
                for i in np.nonzero(ptp_np <= 0)[0]
            ]
            raise ValueError(
                f"parameter range(s) with max <= min: {bad}; fixed (pinned) "
                "parameters must be removed from the parameter file (see "
                "utils.io.delete_parameters_from_pickle), not zero-width"
            )
        ptp = jnp.asarray(ptp_np, dtype=dtype)
        self.gp_config = GPConfig(
            kernel=KernelConfig(kernel_type), alpha=self.gp_alpha,
            map_prior_strength=getattr(self, "gp_map_prior_strength", 0.0),
            grad_precision=getattr(self, "gp_grad_precision", "default"),
        )
        noise_diag = self._pc_noise_diag(eventMask, npc_used)
        return design, jnp.asarray(np.asarray(z).T, dtype=dtype), ptp, noise_diag

    def _finalize_training(self, gp_state: GPState):
        """Stage 3 of training: transform matrices + jitted predict programs."""
        self.gp_state = gp_state
        npc_used = self._npc_used
        if not self.perform_no_PCA_:
            self._set_transform_matrices(npc_used)
        self._trained = True
        self._build_predict_fn()

    def trainEmulator(self, eventMask, kernel_type: str = "RBF"):
        """Train on the masked subset of events (reference: src/emulator.py:257-363)."""
        design, z_t, ptp, noise_diag = self._prepare_training(
            eventMask, kernel_type
        )
        logger.info("Train GP emulators with %d training points ...", design.shape[0])
        gp_state: GPState = gp_fit(
            design,
            z_t,
            ptp,
            config=self.gp_config,
            nrestarts=self.nrestarts,
            key=jax.random.PRNGKey(self.seed),
            maxiter=self.gp_maxiter,
            noise_diag=noise_diag,
        )
        logger.info("GP LMLs: %s", np.asarray(gp_state.lml))
        self._finalize_training(gp_state)

    def _set_transform_matrices(self, npc_used: int):
        # Full linear map PC-space -> physical space:
        # rows scaled by each PC's explained std dev, columns by the
        # standardization scale (reference: src/emulator.py:335-339).
        # Host numpy (one-time training prep; shipped to device once by
        # _collect_predict_state).
        comps = np.asarray(self.pca.components, dtype=np.float64)
        ev = np.asarray(self.pca.explained_variance, dtype=np.float64)
        scale = np.asarray(self.scaler.scale, dtype=np.float64)
        np_dtype = np.dtype(self._dtype)
        trans = comps * np.sqrt(ev)[:, None] * scale
        self._trans_matrix = trans.astype(np_dtype)
        a = trans[:npc_used]
        # var propagation: cov_ij = sum_k A_ki var_k A_kj
        self._var_trans = (
            np.einsum("ki,kj->kij", a, a)
            .reshape(npc_used, self.nobs * self.nobs)
            .astype(np_dtype)
        )
        b = trans[npc_used:]
        cov_trunc = b.T @ b + np.diag(
            1e-4 * np.asarray(self.scaler.var, dtype=np.float64)
        )
        self._cov_trunc = cov_trunc.astype(np_dtype)
        # the diagonal is consumed by the diag-predict state; keep a host
        # copy so building that state never pulls the device-resident block
        # back over the wire (the load path pays the same care below)
        self._cov_trunc_diag = np.ascontiguousarray(
            np.diagonal(cov_trunc)
        ).astype(np_dtype)

    def _select_npc(self, pca) -> int:
        """Number of PCs to emulate; subclass hook (BAND heads use an
        explained-variance threshold instead of a fixed count)."""
        return min(self.npc, pca.components.shape[0])

    def _pc_noise_diag(self, eventMask, npc_used):
        """Per-(PC, event) known noise variances for the GP Gram diagonal;
        None for the homoskedastic sklearn head (PCSK overrides)."""
        return None

    # ---------------------------------------------------------------- predict
    #
    # IMPORTANT call convention: every jitted predict program takes the
    # emulator arrays as an explicit ``state`` pytree ARGUMENT, never as
    # closure captures.  On this TPU runtime a jitted function that closes
    # over a device array pays a ~25 ms fixed re-upload penalty per call
    # (measured; size-independent); passing the same arrays as arguments
    # costs microseconds.  Static flags (Python bools/configs) stay in the
    # closure -- they are compile-time constants.

    def _collect_predict_state(self):
        """Device pytree of everything the predict programs need.

        The GPState is trimmed to the leaves gp_predict actually reads
        (params/x/linv/alpha_vec): shipping chol/y/lml would pin an unused
        extra ~(b, n, n) buffer per emulator (flagship: ~16 MB x 9) in every
        jitted-call pytree."""
        gs = self.gp_state
        empty = jnp.zeros((0,), dtype=self._dtype)
        slim = GPState(
            params=gs.params, x=gs.x, y=empty, chol=empty,
            alpha_vec=gs.alpha_vec, linv=gs.linv, lml=empty,
        )
        st = {"gp_state": slim, "scaler": self.scaler}
        # fused Pallas predict state (TPU f32 RBF): kernel-ready padded
        # layouts for ops.pallas_predict -- host-numpy prep, built once
        from ..ops import pallas_predict as _pp

        if _pp.fused_eligible(
            self.gp_config.kernel.kind, gs.x.shape[1], self._dtype
        ):
            params_np = {
                k: np.asarray(v, dtype=np.float64)
                for k, v in gs.params.items()
            }
            fused = _pp.build_fused_state(params_np, np.asarray(gs.x))
            if isinstance(gs.linv, jax.Array):
                # gp_fit leaves the factor on the device: augment + bf16-split
                # it there instead of round-tripping ~33 MB per emulator over
                # the tunnel.  Emulator.load also lands here (it converts
                # linv via jnp.asarray), so in practice EVERY in-package
                # caller takes this path; the host branch below covers only
                # externally constructed numpy GPStates and test callers.
                # The two builders agree bitwise
                # (test_attach_factors_device_matches_host).
                fused = _pp.attach_fused_factors_device(
                    fused, gs.linv, gs.alpha_vec
                )
            else:
                fused = _pp.attach_fused_factors(
                    fused, np.asarray(gs.linv), np.asarray(gs.alpha_vec)
                )
            # predictive kdiag per PC (amp + noise; RBF diag is constant)
            fused["kdiag"] = jnp.asarray(
                (np.exp(params_np["log_amp"])
                 + np.exp(params_np["log_noise"])).astype(np.float32)
            )
            st["gp_fused"] = fused
        if not self.perform_no_PCA_:
            st["trans_matrix"] = self._trans_matrix
            st["var_trans"] = self._var_trans
            st["cov_trunc"] = self._cov_trunc
            # host-precomputed diagonal (set alongside _cov_trunc at fit and
            # load time): np.diagonal(np.asarray(...)) here would transfer
            # the whole (nobs, nobs) device block back to host per emulator
            st["cov_trunc_diag"] = self._cov_trunc_diag
        if self.parameterTrafoPCA_:
            st["pp_packed"] = pack_param_pca(self.param_pca_state)
        # one device upload for everything (training prep is host numpy).
        # dtype probed WITHOUT np.asarray: that would copy already-on-device
        # leaves (linv is ~16 MB per flagship emulator) back to host just to
        # read .dtype.  Host leaves are dtype-converted in numpy and shipped
        # in ONE batched jax.device_put (per-leaf jnp.asarray would pay a
        # separate dispatch each); device leaves stay put (their dtype is
        # already the working dtype -- jnp.asarray would be a no-op).
        np_dtype = np.dtype(jnp.dtype(self._dtype).name)

        def _convert(a):
            if isinstance(a, jax.Array):
                # the fused-predict state carries bf16 hi/lo operand splits
                # (ops/pallas_predict.py): upcasting them to the working
                # dtype would double their VMEM footprint and break the
                # 3-pass matmul decomposition
                if a.dtype == jnp.bfloat16:
                    return a
                return jnp.asarray(a, dtype=self._dtype)
            kind = np.dtype(getattr(a, "dtype", np.result_type(a))).kind
            return np.asarray(a, dtype=np_dtype if kind == "f" else None)

        return jax.device_put(jax.tree.map(_convert, st))

    def _build_predict_fn(self):
        """Assemble the fused predict programs (jitted once per training)."""
        no_pca = self.perform_no_PCA_
        exp_diag = self.exp_and_cov_diagonal_
        param_pca = self.parameterTrafoPCA_
        groups = tuple(self.param_pca_groups)
        gp_config = self.gp_config
        nobs = self.nobs
        npc_used = self._npc_used

        def transform_x(state, x):
            if param_pca:
                return apply_param_pca_packed(state["pp_packed"], groups, x)
            return x

        def predict_fn(state, x, extra_std):
            x = transform_x(state, x)
            gp_mean, gp_var = gp_predict(state["gp_state"], x, config=gp_config)
            # gp_mean/gp_var: (npc, m) -> (m, npc)
            gp_mean = gp_mean.T
            gp_var = gp_var.T + extra_std[:, None] ** 2
            scaler = state["scaler"]
            if no_pca:
                mean = gp_mean * scaler.scale + scaler.mean
                # DELIBERATE reference divergence: the reference returns the
                # diagonal covariance in STANDARDIZED units while de-scaling
                # the mean (src/emulator.py:563-565 vs 589-592) -- a unit
                # mismatch; here the variance is de-standardized consistently
                # (scale^2)
                var_phys = gp_var * (scaler.scale**2)
                cov = jax.vmap(jnp.diag)(var_phys)
            else:
                mean = gp_mean @ state["trans_matrix"][:npc_used] + scaler.mean
                cov = (gp_var @ state["var_trans"]).reshape(-1, nobs, nobs)
                cov = cov + state["cov_trunc"]
            if exp_diag:
                mean = jnp.exp(mean)
                fstd = jnp.sqrt(jnp.diagonal(cov, axis1=1, axis2=2))
                cov = jax.vmap(jnp.diag)((fstd * mean) ** 2)
            return mean, cov

        def make_pc_core(fast_grad, raw: bool = False):
            """``raw=True`` returns the WHITENED PC-space GP outputs
            (gp_mean (m, npc), gp_var (m, npc)) without the
            PC -> observable projection: the calibration layer's
            PC-space Woodbury likelihood consumes these directly (the
            projection, exp-data subtraction and c0_inv matvec collapse
            into precomputed (npc, npc)/(npc,) constants -- see
            samplers/chain.make_lowrank_block), so the (m, nobs) mean
            never materializes on the sampling hot path."""
            def pc_core(state, x):
                x = transform_x(state, x)
                if fast_grad and "gp_fused" in state:
                    # fused Pallas kernel (TPU f32 RBF): kstar build, mean
                    # matvec and the variance quadratic form in one
                    # VMEM-resident pass (ops/pallas_predict.py); same
                    # validated maximum(kdiag - q, 0) epilogue as gp_predict.
                    # grad_precision="default" picks the 1-pass bf16
                    # backward -- identical VALUES, cheap sampling gradients
                    from ..ops.pallas_predict import (
                        fused_pc_predict,
                        fused_pc_predict_fastbwd,
                    )

                    fused_fn = (
                        fused_pc_predict_fastbwd
                        if gp_config.grad_precision == "default"
                        else fused_pc_predict
                    )
                    fs = state["gp_fused"]
                    gp_mean, qform = fused_fn(fs, x)  # (m, npc)
                    gp_var = jnp.maximum(fs["kdiag"][None, :] - qform, 0.0)
                else:
                    gp_mean, gp_var = gp_predict(
                        state["gp_state"], x, config=gp_config,
                        fast_grad=fast_grad,
                    )
                    gp_mean, gp_var = gp_mean.T, gp_var.T  # (m, npc)
                if raw:
                    return gp_mean, gp_var
                scaler = state["scaler"]
                if no_pca:
                    mean = gp_mean * scaler.scale + scaler.mean
                else:
                    mean = gp_mean @ state["trans_matrix"][:npc_used] + scaler.mean
                return mean, gp_var

            return pc_core

        pc_core = make_pc_core(False)
        # reverse-mode-optimized variant for the sampling likelihood (HMC/
        # Langevin gradients); NOT jacfwd-compatible -- sensitivity analysis
        # keeps the vanilla pc_core (see gp._norm_mean_var)
        pc_core_fastgrad = make_pc_core(True)
        pc_raw = make_pc_core(False, raw=True)
        pc_raw_fastgrad = make_pc_core(True, raw=True)

        def predict_diag(state, x):
            mean, gp_var = pc_core(state, x)
            if no_pca:
                var = gp_var * (state["scaler"].scale ** 2)
            else:
                a = state["trans_matrix"][:npc_used]
                var = gp_var @ (a**2) + state["cov_trunc_diag"]
            if exp_diag:
                mean = jnp.exp(mean)
                var = var * (mean**2)
            return mean, var

        self.predict_state = self._collect_predict_state()
        self.predict_fn_pure = predict_fn
        self.predict_pc_pure = pc_core
        self.predict_pc_pure_fastgrad = pc_core_fastgrad
        self.predict_pc_raw_pure = pc_raw
        self.predict_pc_raw_pure_fastgrad = pc_raw_fastgrad
        self.predict_diag_pure = predict_diag
        self._predict_jit = jax.jit(predict_fn)
        self._predict_pc_jit = jax.jit(pc_core)
        self._predict_diag_jit = jax.jit(predict_diag)

    def predict(self, X, return_cov: bool = True, extra_std=0):
        """Predict observables at ``X`` (nsamples, ndim).

        Returns ``mean (nsamples, nobs)`` and, when ``return_cov``, the
        observable-block covariance ``(nsamples, nobs, nobs)`` -- same
        contract as the reference (src/emulator.py:465-605).
        """
        if not self._trained:
            raise RuntimeError("trainEmulator must be called before predict")
        X = jnp.atleast_2d(jnp.asarray(X, dtype=self._dtype))
        if not return_cov:
            # mean-only program: skips the (m, nobs, nobs) covariance
            # entirely (extra_std only affects the covariance)
            mean, _ = self._predict_diag_jit(self.predict_state, X)
            return np.asarray(mean)
        extra = jnp.broadcast_to(
            jnp.asarray(extra_std, dtype=self._dtype).reshape(-1), (X.shape[0],)
        )
        mean, cov = self._predict_jit(self.predict_state, X, extra)
        return np.asarray(mean), np.asarray(cov)

    def predict_device(self, X, extra_std=None):
        """Device-native predict for fused likelihood pipelines: returns
        jnp arrays (mean, cov) without host transfer."""
        if extra_std is None:
            extra_std = jnp.zeros((X.shape[0],), dtype=self._dtype)
        return self._predict_jit(self.predict_state, X, extra_std)

    # ---------------------------------------------------- low-rank structure

    @property
    def has_lowrank_cov(self) -> bool:
        """True when the predictive covariance has the fixed-basis low-rank
        form ``cov(x) = cov_trunc + A^T diag(gp_var(x)) A`` -- the standard
        PCA mode.  The calibration layer exploits this with Woodbury /
        matrix-determinant-lemma likelihoods: O(nobs^2) per walker instead of
        an O(nobs^3) Cholesky, mathematically exact."""
        return (
            self._trained
            and not self.perform_no_PCA_
            and not self.exp_and_cov_diagonal_
        )

    def lowrank_parts(self):
        """Return (A (npc, nobs), cov_trunc (nobs, nobs)) of the fixed
        covariance decomposition (valid when :attr:`has_lowrank_cov`)."""
        return self._trans_matrix[: self._npc_used], self._cov_trunc

    def predict_pc_device(self, x):
        """Device predict returning (mean (m, nobs), gp_var (m, npc)) --
        the sufficient statistics for the low-rank likelihood."""
        return self._predict_pc_jit(self.predict_state, x)

    def predict_diag_device(self, x):
        """Device predict returning (mean (m, nobs), diag var (m, nobs)).

        Exact for the modes whose covariance is diagonal (``perform_no_PCA``,
        ``exp_and_cov_diagonal``); for the PCA mode it is the exact diagonal
        of the full covariance (low-rank + truncation)."""
        return self._predict_diag_jit(self.predict_state, x)

    def sample_y(self, X, n_samples: int = 1, random_state=None):
        """Sample model output at ``X``; (nsamples_X, n_samples, nobs).

        Emulated PCs are drawn from their GP posteriors; neglected PCs are
        standard normal (reference: src/emulator.py:608-633).
        """
        if self.perform_no_PCA_:
            logger.warning("Sampling from raw data is not implemented.")
            return None
        X = jnp.atleast_2d(jnp.asarray(X, dtype=self._dtype))
        if self.parameterTrafoPCA_:
            Xq = apply_param_pca(self.param_pca_state, tuple(self.param_pca_groups), X)
        else:
            Xq = X
        # sklearn-parity random_state: int, None, Generator, or RandomState
        # (the reference forwards it to GPR.sample_y, which accepts all).
        # None means FRESH draws per call (sklearn's check_random_state(None)
        # uses the global numpy RNG) -- mapping it to a fixed seed would
        # silently return bit-identical ensembles on repeated calls and
        # collapse a user's model-uncertainty band
        if random_state is None:
            seed = int(np.random.randint(2**31))
        elif isinstance(random_state, (int, np.integer)):
            seed = int(random_state)
        elif isinstance(random_state, np.random.Generator):
            seed = int(random_state.integers(2**31))
        elif isinstance(random_state, np.random.RandomState):
            seed = int(random_state.randint(2**31))
        else:
            raise TypeError(
                f"random_state must be int, None, numpy Generator or "
                f"RandomState, got {type(random_state).__name__}"
            )
        key, key_rest = jax.random.split(jax.random.PRNGKey(seed))
        draws = gp_sample(self.gp_state, Xq, key, n_samples, config=self.gp_config)
        # draws: (npc, m, n_samples) -> (m, n_samples, npc)
        draws = jnp.transpose(draws, (1, 2, 0))
        n_total = self.pca.components.shape[0]
        rest = jax.random.normal(
            key_rest,
            (X.shape[0], n_samples, n_total - self._npc_used),
            dtype=self._dtype,
        )
        z = jnp.concatenate([draws, rest], axis=2)
        y = z @ self._trans_matrix + self.scaler.mean
        return np.asarray(y)

    # ------------------------------------------------------------- validation

    def _holdout_masks(self, nTestPoints: int):
        train_mask = np.ones(self.nev, dtype=bool)
        train_mask[self.nev - nTestPoints :] = False
        return train_mask

    def _validation_arrays(self, validate_mask: np.ndarray):
        pred, pred_cov = self.predict(
            self.design_points_org_[validate_mask, :], return_cov=True
        )
        pred_err = np.sqrt(np.diagonal(pred_cov, axis1=1, axis2=2))
        if self.logTrafo_ and not self.exp_and_cov_diagonal_:
            preds = np.exp(pred)
            preds_err = pred_err * np.exp(pred)
        else:
            preds = pred
            preds_err = pred_err
        if self.logTrafo_:
            truth = np.exp(self.model_data[validate_mask, :])
            truth_err = self.model_data_err[validate_mask, :] * truth
        else:
            truth = np.array(self.model_data[validate_mask, :])
            truth_err = np.array(self.model_data_err[validate_mask, :])
        # imputed entries (BAND PCGPwImpute/PCGPwM) are model output, not
        # observed truth -- comparing predictions against them would
        # optimistically bias every holdout metric, so they are marked NaN
        # and the E/H metrics exclude them (utils/metrics nanmean)
        imp = getattr(self, "_impute_mask", None)
        if imp is not None:
            imp_v = np.asarray(imp, bool)[np.asarray(validate_mask, bool), :]
            truth = np.where(imp_v, np.nan, truth)
            truth_err = np.where(imp_v, np.nan, truth_err)
        return (
            preds.reshape(-1, self.nobs),
            preds_err.reshape(-1, self.nobs),
            truth.reshape(-1, self.nobs),
            truth_err.reshape(-1, self.nobs),
        )

    def testEmulatorErrors(self, nTestPoints: int = 1, kernel_type: str = "RBF"):
        """Hold out the last ``nTestPoints`` events; train on the rest and
        predict the holdouts (reference: src/emulator.py:636-679)."""
        logger.info("Validating GP emulator ...")
        train_mask = self._holdout_masks(nTestPoints)
        self.trainEmulator(train_mask, kernel_type=kernel_type)
        return self._validation_arrays(~train_mask)

    def testEmulatorErrorsWithTrainingPoints(
        self, nTestPoints: int = 1, kernel_type: str = "RBF"
    ):
        """Self-consistency: predict the training points themselves; errors
        should be very small (reference: src/emulator.py:682-726)."""
        logger.info("Validating GP emulator ...")
        train_mask = self._holdout_masks(nTestPoints)
        self.trainEmulator(train_mask, kernel_type=kernel_type)
        return self._validation_arrays(train_mask)

    def getAvgTrainingDataRelError(self):
        with np.errstate(divide="ignore", invalid="ignore"):
            rel = np.nan_to_num(self.model_data_err / self.model_data)
        return np.mean(rel, axis=0)

    def _diag_pca_prep(self):
        """Shared host-numpy scaler/PCA prep for the diagnostics paths
        (outputPCAvsParam, print_learning_curve) -- one place so the
        diagnostics cannot silently drift from each other.  Host numpy
        throughout: eager device ops pay a remote compile on this
        runtime."""
        data = np.asarray(
            self._training_data(np.ones(len(self.model_data), dtype=bool)),
            dtype=np.float64,
        )
        scaler = fit_standard_scaler(data)
        pca = fit_pca(scaler_transform(scaler, data), whiten=True)
        # the subclass hook, NOT min(self.npc, ...): BAND heads carry an
        # npc = 10**9 sentinel and select by variance threshold -- the raw
        # min would run diagnostics (learning curves, PCA-vs-param) over
        # ALL min(nev, nobs) PCs the head never emulates
        npc_used = self._select_npc(pca)
        z = np.asarray(
            pca_transform(pca, scaler_transform(scaler, data), npc=npc_used)
        )
        return scaler, pca, npc_used, z

    def outputPCAvsParam(self):
        """Return (design_points, PC scores^T) for diagnostics
        (reference: src/emulator.py:244-249)."""
        _, _, _, z = self._diag_pca_prep()
        return self.design_points, z.T

    def print_learning_curve(self, train_sizes=(0.2, 0.4, 0.6, 0.8, 0.9), n_folds=5):
        """Learning curve per PC: mean train/test R^2 over CV folds at each
        train fraction (reference: src/emulator.py:424-462 via
        ``sklearn.model_selection.learning_curve``).

        Protocol parity with the reference: 5-fold CV; at each fraction the
        GP is refit from scratch on the leading ``frac`` share of the fold's
        training split and scored with R^2 on both splits; the GP uses THIS
        emulator's kernel/alpha configuration (``self.gp_config``), exactly
        as the reference passes its own kernel + ``alpha=0.1`` GPR into
        ``learning_curve``.  Differences from sklearn's implementation:
        hyperparameters are re-optimized by the native vmapped L-BFGS
        (sklearn refits per fold too), and folds come from a fixed seed-0
        permutation rather than sklearn's default splitter ordering.

        Returns a list (one per PC) of arrays (len(train_sizes), 3) with
        columns (n_train, mean train R^2, mean test R^2).

        Cost note: ``gp_fit`` is shape-specialized, so each distinct
        training-set size pays one XLA compile (up to ``len(train_sizes)``
        plus fold-size off-by-ones); on runtimes with slow remote compiles
        this diagnostic is minutes of compile for seconds of compute.
        Padding to one shape is NOT done because duplicated rows would
        change the GP posterior.
        """
        dtype = self._dtype
        _, _, npc_used, z = self._diag_pca_prep()
        design = (
            self.PCA_new_design_points if self.parameterTrafoPCA_ else self.design_points
        )
        design = np.asarray(design, dtype=np.float64)
        ptp = jnp.asarray(self.design_max - self.design_min, dtype=dtype)
        nev = design.shape[0]
        rng = np.random.default_rng(0)
        perm = rng.permutation(nev)
        folds = np.array_split(perm, n_folds)

        def r2(y_true, y_pred):
            ss_res = np.sum((y_true - y_pred) ** 2)
            ss_tot = np.sum((y_true - np.mean(y_true)) ** 2)
            if ss_tot == 0.0:
                # single-element or constant test fold: R^2 is undefined
                # (sklearn warns and returns nan rather than dividing by 0)
                return np.nan
            return 1.0 - ss_res / ss_tot

        train_status = [[] for _ in range(npc_used)]
        for frac in train_sizes:
            tr_scores = np.zeros((npc_used, n_folds))
            te_scores = np.zeros((npc_used, n_folds))
            # folds differ by one event when nev % n_folds != 0: report the
            # MEAN train size actually used so the curve's x-axis matches
            # the averaged scores instead of whichever fold came last
            n_used_folds = []
            for f in range(n_folds):
                test_idx = folds[f]
                train_idx = np.concatenate(
                    [folds[g] for g in range(n_folds) if g != f]
                )
                n_used = max(int(np.ceil(frac * len(train_idx))), 2)
                n_used_folds.append(n_used)
                train_idx = train_idx[:n_used]
                # before any trainEmulator call gp_config doesn't exist yet:
                # fall back to the emulator's CONFIGURED kernel family (an
                # untrained EmulatorBAND with kernel_kind='Matern' must not
                # get learning-curve numbers for an RBF model)
                cfg = getattr(self, "gp_config", None) or GPConfig(
                    kernel=KernelConfig(getattr(self, "kernel_kind_", "RBF")),
                    alpha=self.gp_alpha,
                    map_prior_strength=getattr(
                        self, "gp_map_prior_strength", 0.0
                    ),
                )
                x_tr = jnp.asarray(design[train_idx], dtype=dtype)
                y_tr = jnp.asarray(z[train_idx].T, dtype=dtype)
                state = gp_fit(x_tr, y_tr, ptp, config=cfg,
                               maxiter=self.gp_maxiter)
                pred_tr, _ = gp_predict(state, x_tr, config=cfg)
                pred_te, _ = gp_predict(
                    state, jnp.asarray(design[test_idx], dtype=dtype),
                    config=cfg,
                )
                for i in range(npc_used):
                    tr_scores[i, f] = r2(z[train_idx, i], np.asarray(pred_tr[i]))
                    te_scores[i, f] = r2(z[test_idx, i], np.asarray(pred_te[i]))
            n_used_mean = float(np.mean(n_used_folds))
            for i in range(npc_used):
                train_status[i].append(
                    [n_used_mean,
                     float(np.nanmean(tr_scores[i])),
                     float(np.nanmean(te_scores[i]))]
                )
                logger.info(
                    "GP %d: %.1f samples, train R^2 %.2f, test R^2 %.2f",
                    i, n_used_mean,
                    float(np.nanmean(tr_scores[i])),
                    float(np.nanmean(te_scores[i])),
                )
        return [np.asarray(s) for s in train_status]

    # ---------------------------------------------------------- serialization

    @classmethod
    def from_reference(cls, source):
        """Convert a reference dill-saved sklearn emulator (or live object)
        into a native emulator with identical fitted hyperparameters; see
        :func:`..models.migrate.from_reference`."""
        from .migrate import from_reference

        return from_reference(source)

    def save(self, path):
        """Serialize the trained emulator as a pytree of arrays + metadata
        (replaces the reference's dill object dumps, src/mcmc.py:145-150)."""
        if not self._trained:
            raise RuntimeError("train before saving")
        tree = {
            "gp_params": self.gp_state.params,
            "gp_x": self.gp_state.x,
            "gp_y": self.gp_state.y,
            "gp_chol": self.gp_state.chol,
            "gp_alpha": self.gp_state.alpha_vec,
            "gp_linv": self.gp_state.linv,
            "gp_lml": self.gp_state.lml,
            "scaler": self.scaler,
            "pca": self.pca,
            "trans_matrix": None if self.perform_no_PCA_ else self._trans_matrix,
            "var_trans": None if self.perform_no_PCA_ else self._var_trans,
            "cov_trunc": None if self.perform_no_PCA_ else self._cov_trunc,
            "param_pca_state": self.param_pca_state,
            "pca_new_design_points": (
                self.PCA_new_design_points if self.parameterTrafoPCA_ else None
            ),
            "design_min": self.design_min,
            "design_max": self.design_max,
            "model_data": self.model_data,
            "model_data_err": self.model_data_err,
            "design_points": self.design_points,
            "design_points_org": self.design_points_org_,
            # BAND imputation state: without it a loaded PCGPwM emulator
            # retrains as plain PCGP (the saved model_data is already
            # imputed, so the mask cannot be rebuilt from the data)
            "impute_mask": getattr(self, "_impute_mask", None),
            "impute_col_var": getattr(self, "_impute_col_var", None),
        }
        meta = {
            "npc": self.npc,
            "npc_used": self._npc_used,
            "nobs": self.nobs,
            "nev": self.nev,
            "logTrafo": self.logTrafo_,
            "parameterTrafoPCA": self.parameterTrafoPCA_,
            "exp_and_cov_diagonal": self.exp_and_cov_diagonal_,
            "perform_no_PCA": self.perform_no_PCA_,
            "kernel_kind": self.gp_config.kernel.kind,
            "alpha": self.gp_config.alpha,
            "param_pca_groups": [g._asdict() for g in self.param_pca_groups],
            "pardict": self.pardict,
            "gp_alpha": self.gp_alpha,
            # subclass fields (EmulatorBAND) so retraining works after load
            "method": getattr(self, "method_", None),
            "pc_target_variance": getattr(self, "pc_target_variance", None),
            "map_prior_strength": getattr(self, "gp_map_prior_strength", 0.0),
            "grad_precision": self.gp_config.grad_precision,
        }
        save_pytree(path, tree, meta)

    @classmethod
    def load(cls, path):
        """Reconstruct a trained emulator from :meth:`save` output.

        BAND-method save files (PCGP/PCSK/...) are dispatched to
        :class:`EmulatorBAND` automatically, so retraining a loaded BAND
        emulator keeps its variance-threshold PC selection and
        stochastic-kriging noise instead of silently falling back to the
        sklearn head's behavior.
        """
        from ..ops.scalers import PCAState, StandardScalerState

        tree, meta = load_pytree(path)
        if meta.get("method") is not None and cls is Emulator:
            from .emulator_band import EmulatorBAND

            cls = EmulatorBAND
        elif meta.get("method") is None and cls is not Emulator:
            # EmulatorBAND.load on a plain-Emulator save would build a BAND
            # shell without method_/pc_target_variance that only fails much
            # later, at retrain time, with a confusing AttributeError
            raise ValueError(
                f"{path} holds a plain Emulator save; load it with "
                "Emulator.load (BAND saves carry a 'method' field)"
            )
        self = cls.__new__(cls)
        self.logTrafo_ = meta["logTrafo"]
        self.parameterTrafoPCA_ = meta["parameterTrafoPCA"]
        self.exp_and_cov_diagonal_ = meta["exp_and_cov_diagonal"]
        self.perform_no_PCA_ = meta["perform_no_PCA"]
        self.npc = meta["npc"]
        self._npc_used = meta["npc_used"]
        self.nobs = meta["nobs"]
        self.nev = meta["nev"]
        self.nrestarts = 0
        self.seed = 0
        self.gp_maxiter = 200
        self.gp_alpha = meta.get("gp_alpha", meta["alpha"])
        if meta.get("method") is not None:
            self.method_ = meta["method"]
            self.pc_target_variance = meta.get("pc_target_variance", 0.99)
            self.kernel_kind_ = meta["kernel_kind"]
            im = tree.get("impute_mask")
            icv = tree.get("impute_col_var")
            self._impute_mask = None if im is None else np.asarray(im, bool)
            self._impute_col_var = (
                None if icv is None else np.asarray(icv, np.float64)
            )
        # restored BEFORE gp_config below so the loaded config carries the
        # saved MAP setting (one source of truth)
        self.gp_map_prior_strength = meta.get("map_prior_strength", 0.0)
        self._dtype = working_dtype()
        self.pardict = meta["pardict"]
        self.param_pca_groups = [
            ParamPCAGroup(**g) for g in meta["param_pca_groups"]
        ]
        as_jnp = lambda t: jax.tree.map(jnp.asarray, t)
        chol = jnp.asarray(tree["gp_chol"])
        if "gp_linv" in tree:
            linv = jnp.asarray(tree["gp_linv"])
        else:
            # legacy save files stored the explicit K^-1; rebuild the
            # factored form from the Cholesky (host numpy: one-time load)
            linv = jnp.asarray(
                np.stack([
                    np.linalg.solve(
                        np.asarray(c, dtype=np.float64),
                        np.eye(c.shape[0]),
                    )
                    for c in np.asarray(chol)
                ]).astype(np.asarray(chol).dtype)
            )
        self.gp_state = GPState(
            params=as_jnp(tree["gp_params"]),
            x=jnp.asarray(tree["gp_x"]),
            y=jnp.asarray(tree["gp_y"]),
            chol=chol,
            alpha_vec=jnp.asarray(tree["gp_alpha"]),
            linv=linv,
            lml=jnp.asarray(tree["gp_lml"]),
        )
        self.gp_grad_precision = meta.get("grad_precision", "default")
        self.gp_config = GPConfig(
            kernel=KernelConfig(meta["kernel_kind"]), alpha=meta["alpha"],
            map_prior_strength=self.gp_map_prior_strength,
            grad_precision=self.gp_grad_precision,
        )
        self.scaler = StandardScalerState(*as_jnp(tuple(tree["scaler"])))
        self.pca = (
            None if tree["pca"] is None else PCAState(
                mean=jnp.asarray(tree["pca"][0]),
                components=jnp.asarray(tree["pca"][1]),
                explained_variance=jnp.asarray(tree["pca"][2]),
                explained_variance_ratio=jnp.asarray(tree["pca"][3]),
                whiten=bool(tree["pca"][4]),
            )
        )
        if not self.perform_no_PCA_:
            self._trans_matrix = jnp.asarray(tree["trans_matrix"])
            self._var_trans = jnp.asarray(tree["var_trans"])
            # diagonal from the HOST copy before the device upload (see
            # _set_transform_matrices)
            cov_trunc_np = np.asarray(tree["cov_trunc"])
            self._cov_trunc_diag = np.ascontiguousarray(
                np.diagonal(cov_trunc_np)
            )
            self._cov_trunc = jnp.asarray(tree["cov_trunc"])
        pp = tree["param_pca_state"]
        self.param_pca_state = (
            None if pp is None else ParamPCAState(
                scalers=tuple(StandardScalerState(*as_jnp(tuple(s))) for s in pp[0]),
                pcas=tuple(
                    PCAState(
                        mean=jnp.asarray(p[0]),
                        components=jnp.asarray(p[1]),
                        explained_variance=jnp.asarray(p[2]),
                        explained_variance_ratio=jnp.asarray(p[3]),
                        whiten=bool(p[4]),
                    )
                    for p in pp[1]
                ),
                npcs=tuple(int(n) for n in pp[2]),
            )
        )
        self.design_min = np.asarray(tree["design_min"])
        self.design_max = np.asarray(tree["design_max"])
        self.model_data = np.asarray(tree["model_data"])
        self.model_data_err = np.asarray(tree["model_data_err"])
        self.design_points = np.asarray(tree["design_points"])
        self.design_points_org_ = np.asarray(tree["design_points_org"])
        if self.parameterTrafoPCA_:
            pnd = tree.get("pca_new_design_points")
            if pnd is not None:
                self.PCA_new_design_points = np.asarray(pnd)
            else:  # legacy save files: masked training design (best effort)
                self.PCA_new_design_points = np.asarray(self.gp_state.x)
        if meta.get("method") is not None:  # EmulatorBAND API parity field
            # reference parity (src/emulator_BAND.py:46, 70): the
            # TRANSFORMED dimension under parameter-space PCA
            self.nparameters = (
                self.PCA_new_design_points.shape[1]
                if self.parameterTrafoPCA_
                else self.design_points.shape[1]
            )
        self._trained = True
        self._build_predict_fn()
        return self
