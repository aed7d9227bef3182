"""Import trained REFERENCE emulators (dill-serialized sklearn objects).

The reference persists whole Python ``Emulator`` objects with dill
(EmulatorTraining.ipynb cell 5; loaded at src/mcmc.py:145-150).  A user
switching to this framework can convert those files directly -- the fitted
kernel hyperparameters, PCA basis, and scalers are imported EXACTLY (no
retraining), so the converted emulator reproduces the reference's
predictions to float tolerance and immediately gains the fused TPU predict
and Woodbury-likelihood paths.

Supported source: the reference's sklearn-backed ``Emulator``
(src/emulator.py) with kernel ``Const * (RBF | Matern) + White`` per PC,
including ``logTrafo``, ``exp_and_cov_diagonal``, ``perform_no_PCA`` and
``parameterTrafoPCA`` configurations.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..config import working_dtype
from ..ops.kernels import KernelConfig
from ..ops.scalers import PCAState, StandardScalerState
from .emulator import Emulator
from .gp import GPConfig, finalize_gp_state
from .param_pca import ParamPCAState, default_groups

logger = logging.getLogger(__name__)


def _scaler_state(sk_scaler, dtype) -> StandardScalerState:
    return StandardScalerState(
        mean=jnp.asarray(sk_scaler.mean_, dtype=dtype),
        scale=jnp.asarray(sk_scaler.scale_, dtype=dtype),
        var=jnp.asarray(sk_scaler.var_, dtype=dtype),
    )


def _pca_state(sk_pca, dtype, whiten) -> PCAState:
    return PCAState(
        mean=jnp.asarray(sk_pca.mean_, dtype=dtype),
        components=jnp.asarray(sk_pca.components_, dtype=dtype),
        explained_variance=jnp.asarray(sk_pca.explained_variance_, dtype=dtype),
        explained_variance_ratio=jnp.asarray(
            sk_pca.explained_variance_ratio_, dtype=dtype
        ),
        whiten=whiten,
    )


def _kernel_params_from_sklearn(gp, dtype):
    """Extract {log_amp, log_ls, log_noise} from a fitted reference GPR.

    Reference kernel structure: ``Const * (RBF | Matern) + White``
    (src/emulator.py:284-306).
    """
    k = gp.kernel_
    prod, white = k.k1, k.k2
    const, base = prod.k1, prod.k2
    kind = type(base).__name__  # "RBF" or "Matern"
    if kind == "Matern" and not np.isclose(base.nu, 1.5):
        raise ValueError(f"unsupported Matern nu={base.nu}; only 1.5")
    ls = np.atleast_1d(base.length_scale)
    return (
        {
            "log_amp": jnp.asarray(np.log(const.constant_value), dtype=dtype),
            "log_ls": jnp.asarray(np.log(ls), dtype=dtype),
            "log_noise": jnp.asarray(np.log(white.noise_level), dtype=dtype),
        },
        kind,
        float(gp.alpha),
    )


def _load_dill(source):
    """Load a reference dill file, or pass a live object through.

    Raises a targeted error when unpickling fails because the file embeds a
    surmise object and surmise is not installed (the reference's
    EmulatorBAND dill-dumps its whole wrapper including ``self.emu``,
    src/emulator_BAND.py:268-292, loaded at src/mcmc.py:145-150)."""
    if not (isinstance(source, (str, bytes)) or hasattr(source, "__fspath__")):
        return source
    import dill

    try:
        with open(source, "rb") as f:
            return dill.load(f)
    except ModuleNotFoundError as e:
        raise ValueError(
            f"cannot unpickle {source!r}: it references the module "
            f"{e.name!r}, which is not installed (reference EmulatorBAND "
            "files embed a live surmise emulator).  Either install "
            f"{e.name!r} to unpickle and re-run this conversion, or retrain "
            "natively from the original training pickle: "
            "EmulatorBAND(training_set_path=..., parameter_file=..., "
            "method=...).trainEmulatorAutoMask()"
        ) from e


def _convert_param_pca(self, ref, dtype):
    """Import the reference's fitted parameter-space PCA transform
    (scalers + PCAs for the bulk/shear/yloss groups)."""
    # canonical grids/curves come from param_pca.default_groups() (single
    # source of truth); only the parameter indices are taken from the
    # reference object
    ref_indices = {
        "bulk": tuple(ref.indices_zeta_s_parameters),
        "shear": tuple(ref.indices_eta_s_parameters),
        "yloss": tuple(ref.indices_yloss_parameters),
    }
    groups = [
        g._replace(indices=ref_indices[g.name]) for g in default_groups()
    ]
    self.param_pca_groups = groups
    scalers, pcas, npcs = [], [], []
    for sc, pc in [
        (ref.paramTrafoScaler_bulk, ref.paramTrafoPCA_bulk),
        (ref.paramTrafoScaler_shear, ref.paramTrafoPCA_shear),
        (ref.paramTrafoScaler_yloss, ref.paramTrafoPCA_yloss),
    ]:
        scalers.append(_scaler_state(sc, dtype))
        pcas.append(_pca_state(pc, dtype, whiten=False))
        npcs.append(int(pc.n_components_))
    self.param_pca_state = ParamPCAState(
        scalers=tuple(scalers), pcas=tuple(pcas), npcs=tuple(npcs)
    )
    self.PCA_new_design_points = np.asarray(ref.PCA_new_design_points)


def from_reference(source) -> Emulator:
    """Convert a reference sklearn-backed emulator to a native one.

    ``source``: a path to the reference's dill ``.sav`` file, or the live
    reference ``Emulator`` object.  Returns a trained native
    :class:`Emulator` whose predictions match the source to float tolerance.

    Reference ``EmulatorBAND`` objects (surmise-backed, recognizable by
    their ``method_`` attribute and no ``gps``) are dispatched to
    :func:`band_from_reference`.
    """
    ref = _load_dill(source)
    if not hasattr(ref, "gps"):
        if hasattr(ref, "method_") and hasattr(ref, "model_data"):
            return band_from_reference(ref)
        raise ValueError(
            "source has no fitted sklearn GPs and no BAND method tag; only "
            "the reference's Emulator / EmulatorBAND objects are convertible"
        )

    dtype = working_dtype()
    self = Emulator.__new__(Emulator)
    self.logTrafo_ = bool(getattr(ref, "logTrafo_", False))
    self.parameterTrafoPCA_ = bool(getattr(ref, "parameterTrafoPCA_", False))
    self.exp_and_cov_diagonal_ = bool(getattr(ref, "exp_and_cov_diagonal_", False))
    self.perform_no_PCA_ = bool(getattr(ref, "perform_no_PCA_", False))
    self.npc = int(ref.npc)
    self.nobs = int(ref.nobs)
    self.nev = int(ref.nev)
    self.nrestarts = 0
    self.seed = 0
    self.gp_maxiter = 200  # retraining APIs (testEmulatorErrors) must optimize
    self._dtype = dtype
    self.pardict = dict(getattr(ref, "pardict", {}))
    self.design_min = np.asarray(ref.design_min, dtype=float)
    self.design_max = np.asarray(ref.design_max, dtype=float)
    self.model_data = np.asarray(ref.model_data)
    self.model_data_err = np.asarray(ref.model_data_err)
    self.design_points = np.asarray(ref.design_points)
    self.design_points_org_ = np.asarray(
        getattr(ref, "design_points_org_", ref.design_points)
    )

    # --- GP batch from the fitted sklearn regressors ----------------------
    params_list, kinds, alphas = [], set(), set()
    for gp in ref.gps:
        p, kind, alpha = _kernel_params_from_sklearn(gp, dtype)
        params_list.append(p)
        kinds.add(kind)
        alphas.add(alpha)
    if len(kinds) != 1 or len(alphas) != 1:
        raise ValueError("mixed kernel types/alphas across PCs are unsupported")
    kind, alpha = kinds.pop(), alphas.pop()
    self.gp_alpha = alpha
    self.gp_config = GPConfig(kernel=KernelConfig(kind), alpha=alpha)

    x_train = jnp.asarray(ref.gps[0].X_train_, dtype=dtype)
    y_batch = jnp.asarray(
        np.stack([np.asarray(gp.y_train_) for gp in ref.gps]), dtype=dtype
    )
    params = jax.tree.map(lambda *leaves: jnp.stack(leaves), *params_list)
    # shared finalization (incl. the jitter-rescue Cholesky) with gp_fit
    self.gp_state = finalize_gp_state(params, x_train, y_batch, self.gp_config)
    logger.info("imported %d reference GPs (LML %s)", len(ref.gps),
                np.asarray(self.gp_state.lml))

    # --- transforms --------------------------------------------------------
    self.scaler = _scaler_state(ref.scaler, dtype)
    if self.perform_no_PCA_:
        self.pca = None
        self._npc_used = self.nobs
    else:
        self.pca = _pca_state(ref.pca, dtype, whiten=True)
        self._npc_used = min(self.npc, int(ref.pca.components_.shape[0]))

    # --- parameter-space PCA -----------------------------------------------
    self.param_pca_groups = default_groups()
    self.param_pca_state = None
    if self.parameterTrafoPCA_:
        _convert_param_pca(self, ref, dtype)

    self._npc_used = min(self._npc_used, len(ref.gps))
    self._finalize_training(self.gp_state)
    return self


def band_from_reference(source, *, gp_maxiter: int = 200, seed: int = 0):
    """Convert a reference dill ``EmulatorBAND`` into a native one.

    The reference BAND wrapper delegates all numerics to a live surmise
    0.2.1 emulator stored in ``self.emu`` (src/emulator_BAND.py:268-292).
    surmise's per-PC hyperparameters belong to its own kernel family and do
    not transplant into the native Matern-ARD GP core -- but the wrapper
    carries the COMPLETE training state verbatim: the (already noise-
    filtered, optionally log-transformed) ``model_data`` / ``model_data_err``
    arrays, the design, the method tag, and every transform flag.  The
    conversion therefore rebuilds the native head on exactly that data -- a
    deterministic retrain (seconds on TPU), after which the emulator serves
    the same role in a :class:`..samplers.chain.Chain` as the reference's
    dill object did (src/mcmc.py:145-150).

    If unpickling itself fails because surmise is not installed, a targeted
    error names the retrain path (see :func:`_load_dill`).
    """
    from .emulator_band import EmulatorBAND, _impute_iterative_svd

    ref = _load_dill(source)
    if not hasattr(ref, "method_") or not hasattr(ref, "model_data"):
        raise ValueError(
            "source does not look like a reference EmulatorBAND (no "
            "method_/model_data attributes)"
        )
    method = str(ref.method_)
    # validate BEFORE building: __new__ bypasses EmulatorBAND.__init__'s
    # check, and an unknown method_ (the reference constructor never
    # validates it -- the forgotten-raise bug emulator_band.py fixes)
    # would otherwise fall through _pc_noise_diag to a plain homoskedastic
    # PCGP head with silently wrong posterior widths
    from .emulator_band import _METHODS

    if method not in _METHODS:
        raise ValueError(
            f"reference emulator has unknown method_ {method!r} "
            f"(expected one of {sorted(_METHODS)}); refusing to convert "
            "it as a plain PCGP"
        )
    dtype = working_dtype()
    self = EmulatorBAND.__new__(EmulatorBAND)
    self.method_ = method
    self.pc_target_variance = 0.99  # surmise's PC-retention default
    self.logTrafo_ = bool(getattr(ref, "logTrafo_", False))
    self.parameterTrafoPCA_ = bool(getattr(ref, "parameterTrafoPCA_", False))
    self.exp_and_cov_diagonal_ = bool(getattr(ref, "exp_and_cov_diagonal_", False))
    self.max_rel_uncertainty_data_ = float(
        getattr(ref, "max_rel_uncertainty_data_", 0.1)
    )
    self.perform_no_PCA_ = False
    self.npc = 10**9  # resolved by the variance threshold at train time
    self.nrestarts = 0
    self.seed = seed
    self.gp_maxiter = gp_maxiter
    self.gp_alpha = 1e-6
    self._dtype = dtype
    self.pardict = dict(getattr(ref, "pardict", {}))
    self.design_min = np.asarray(ref.design_min, dtype=float)
    self.design_max = np.asarray(ref.design_max, dtype=float)
    self.model_data = np.asarray(ref.model_data, dtype=np.float64)
    self.model_data_err = np.asarray(ref.model_data_err, dtype=np.float64)
    self.design_points = np.asarray(ref.design_points, dtype=np.float64)
    self.design_points_org_ = np.asarray(
        getattr(ref, "design_points_org_", ref.design_points), dtype=np.float64
    )
    self.nev, self.nobs = self.model_data.shape
    self.param_pca_groups = default_groups()
    self.param_pca_state = None
    if self.parameterTrafoPCA_:
        self.targetVariance = float(getattr(ref, "targetVariance", 0.99))
        # ref.design_min/max are already the PC ranges (splice semantics)
        _convert_param_pca(self, ref, dtype)
    # reference parity (src/emulator_BAND.py:46, 70): under parameter-space
    # PCA, nparameters is the TRANSFORMED dimension
    self.nparameters = (
        self.PCA_new_design_points.shape[1] if self.parameterTrafoPCA_
        else self.design_points.shape[1]
    )

    self._impute_mask = None
    self._impute_col_var = None
    if method in ("PCGPwImpute", "PCGPwM"):
        self.model_data, self._impute_mask, self._impute_col_var = (
            _impute_iterative_svd(self.model_data)
        )
    self._trained = False
    logger.info(
        "rebuilding native %s head from reference BAND state "
        "(%d events x %d observables) ...", method, self.nev, self.nobs,
    )
    self.trainEmulatorAutoMask()
    return self
