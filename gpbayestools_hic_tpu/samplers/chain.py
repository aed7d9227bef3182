"""Bayesian calibration driver: priors, fused likelihood, MCMC front-ends.

API-parity rebuild of the reference ``Chain`` (src/mcmc.py:95-819) with the
entire likelihood hot path -- N-emulator predict, block-diagonal covariance
stitch, experimental-covariance add, and batched Cholesky solve -- fused into
ONE jitted device program per walker batch.  The reference evaluates a
Python ``map(mvn_loglike, dY, cov)`` serially per walker (src/mcmc.py:217);
here the walker batch is vmapped (and shardable across chips over a
``walkers`` mesh axis, :mod:`..parallel.mesh`).

Reference semantics preserved:

- uniform box prior normalized by the prior volume (src/mcmc.py:169-185);
- outside-box points get ``-inf``, or ``-1e300`` in ``finite=True`` mode
  (flows cannot digest -inf; src/mcmc.py:196-198);
- the vestigial ``extra_std`` term: zeroed before use, its prior reduces to
  the constant ``2 log(1e-16)`` which is still *added* for numerical parity
  with reference chains (src/mcmc.py:205, 220-221, 281, 296-297);
- experimental covariance is diagonal from stat errors, but dense input is
  accepted (SURVEY.md quirk list);
- chain pickle contract ``{"chain": (nwalkers, nsteps, ndim)}`` with
  resume-by-append (src/mcmc.py:354-364, 407-426).
"""

from __future__ import annotations

import logging
import pickle
import zlib
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import working_dtype
from ..runtime import parse_model_parameter_file
from ..ops.linalg import mvn_loglike_diagcov_batch, spd_qform_logdet
from ..ops.pallas_mvn import mvn_loglike_best
from ..utils.io import load_exp_data_pickle
from .ensemble import run_ensemble

logger = logging.getLogger(__name__)

# 2*log(1e-16): the constant the reference's zeroed extra_std prior adds.
_EXTRA_STD_CONST = 2.0 * np.log(1e-16)


def _warm_fallback_key(seed: int, final_state: np.ndarray) -> jax.Array:
    """Production key for a warm-started HMC run with no chain pickle.

    Folds the warm start's final-state fingerprint into the key so chained
    continuations with the same seed (run2 from res1, run3 from res2) have
    distinct random streams -- identical momenta across segments would make
    the concatenated chain cross-correlated.  (The chain-resume branch gets
    the same property by folding in the stored chain length; here no chain
    exists to count.)  Deterministic: the same (seed, final_state) pair
    always yields the same key.  The 1 << 21 offset keeps the fold index
    clear of a fresh run's fold_in/split indices (threefry fold_in(k, i)
    == split(k, n)[i] for i < n)."""
    fs = np.ascontiguousarray(np.asarray(final_state, dtype=np.float64))
    fs_tag = zlib.crc32(fs.tobytes()) & 0x7FFFFFFF
    return jax.random.fold_in(
        jax.random.fold_in(jax.random.PRNGKey(seed), 1 << 21), fs_tag
    )


class Chain:
    """High-level interface for running MCMC calibration and accessing results."""

    def __init__(
        self,
        mcmc_path: str = "./mcmc/chain.pkl",
        expdata_path: str = "./exp_data.dat",
        model_parafile: str = "./model.dat",
    ):
        logger.info("Initializing MCMC ...")
        self.mcmc_path = Path(mcmc_path)
        self.mcmc_path.parent.mkdir(parents=True, exist_ok=True)

        self.pardict = parse_model_parameter_file(model_parafile)
        self.ndim = len(self.pardict)
        self.label = [v[0] for v in self.pardict.values()]
        self.min = np.array([v[1] for v in self.pardict.values()])
        self.max = np.array([v[2] for v in self.pardict.values()])
        bad = [name for name, v in self.pardict.items() if v[2] <= v[1]]
        if bad:
            # a pinned or inverted range gives prior_volume <= 0 (inf/NaN
            # log-prior) and every strict inside test false -> the failure
            # would otherwise surface as a misleading "non-finite
            # log-posterior at the starting state" much later
            raise ValueError(
                f"parameter range(s) with max <= min in {model_parafile}: "
                f"{bad}"
            )
        self.prior_volume_ = float(np.prod(self.max - self.min))

        logger.info("Loading the experiment data from %s ...", expdata_path)
        self.expdata, self.expdata_cov = load_exp_data_pickle(expdata_path)
        self.nobs = self.expdata.shape[1]
        self.emuList: list = []
        self.chain = False
        self._dtype = working_dtype()
        self._device_fns = None
        self._likelihood_mode = "auto"

    # ------------------------------------------------------------ mode knob

    @property
    def likelihood_mode(self):
        """Likelihood assembly mode: ``"auto"`` (Woodbury/diagonal fast
        paths), ``"generic"`` (per-block dense Cholesky), or ``"stitched"``
        (full dense-covariance Cholesky, the reference's src/mcmc.py:214
        shape).  Assigning a new mode invalidates the compiled device
        programs (they bake the mode in at trace time) -- without this a
        mode change after any posterior evaluation would be silently
        ignored."""
        return self._likelihood_mode

    @likelihood_mode.setter
    def likelihood_mode(self, value):
        if value not in ("auto", "generic", "stitched"):
            raise ValueError(
                f"unknown likelihood_mode {value!r}: use 'auto' (Woodbury/"
                "diagonal fast paths), 'generic' (per-block Cholesky), or "
                "'stitched' (full dense-covariance Cholesky, the "
                "reference's src/mcmc.py:214 shape)"
            )
        if value != self._likelihood_mode:
            self._device_fns = None
        self._likelihood_mode = value

    # ------------------------------------------------------------- emulators

    def loadEmulator(self, emulatorPathList):
        """Load trained emulators (paths to :meth:`Emulator.save` files or
        live trained emulator objects -- anything exposing the pure-predict
        contract the likelihood build consumes: ``predict_state`` plus
        ``predict_fn_pure``)."""
        from ..models.emulator import Emulator

        for emu in emulatorPathList:
            # duck-type on the attributes _build_device_fns actually reads,
            # so an incomplete object fails HERE, not deep in the build
            if (
                hasattr(emu, "predict_fn_pure")
                and hasattr(emu, "predict_state")
                and hasattr(emu, "nobs")
            ):
                self.emuList.append(emu)
                continue
            if not isinstance(emu, (str, Path)) and hasattr(emu, "predict"):
                # a live reference-style emulator object: convert it like
                # the dill-file path below (models/migrate.from_reference
                # raises an informative error for unconvertible objects)
                logger.info("converting live reference-style emulator ...")
                self.emuList.append(Emulator.from_reference(emu))
                continue
            try:
                self.emuList.append(Emulator.load(emu))
            except (KeyError, TypeError, ModuleNotFoundError,
                    pickle.UnpicklingError):
                # not our pytree format: try a reference dill object
                # (src/mcmc.py:145-150 loads those directly).  The tuple
                # includes the unpickle failures a reference dill raises
                # inside Emulator.load (ModuleNotFoundError for the 'src'
                # package, UnpicklingError for by-value payloads) so those
                # files still reach from_reference's curated error/guidance
                # instead of dying on a raw traceback here
                logger.info("converting reference dill emulator %s ...", emu)
                self.emuList.append(Emulator.from_reference(emu))
        logger.info("Number of Emulators: %d", len(self.emuList))
        self._device_fns = None  # force rebuild

    # ------------------------------------------------------------ device path

    def _build_device_fns(self):
        """Assemble the fused log-likelihood / log-posterior programs."""
        if not self.emuList:
            raise RuntimeError("loadEmulator before evaluating the posterior")
        # Build-time array prep stays in NUMPY: every eager device op here
        # (slices, diag, eye, log) pays a multi-second remote compile on this
        # runtime (see CLAUDE.md) -- measured 12.9 s of Chain construction
        # before this was host-side.  Device arrays are created only via
        # jnp.asarray (a device_put, no compilation).
        dtype = self._dtype
        np_dtype = np.dtype(jnp.dtype(dtype).name)
        lo = jnp.asarray(self.min, dtype=dtype)
        hi = jnp.asarray(self.max, dtype=dtype)
        expdata_np = np.asarray(self.expdata, dtype=np_dtype).flatten()
        expcov_np = np.asarray(self.expdata_cov, dtype=np_dtype)
        expdata = jnp.asarray(expdata_np)
        expcov = jnp.asarray(expcov_np)
        nobs = self.nobs
        log_prior_inside = jnp.asarray(
            -np.log(self.prior_volume_), dtype=dtype
        )
        emus = list(self.emuList)
        offsets = np.cumsum([0] + [e.nobs for e in emus])
        if offsets[-1] != nobs:
            raise ValueError(
                f"emulators predict {offsets[-1]} observables, experimental "
                f"data has {nobs}"
            )

        # The experimental covariance the reference builds is diagonal
        # (src/mcmc.py:320-322), which makes the total covariance
        # block-diagonal per emulator: the likelihood then factorizes over
        # blocks and the full (nobs, nobs) Cholesky (544^3 in the flagship
        # run) collapses to per-emulator blocks -- mathematically identical,
        # ~10-100x fewer FLOPs, and never materializes the stitched matrix.
        # Dense experimental covariance falls back to the stitched path.
        off = expcov_np - np.diag(np.diagonal(expcov_np))
        exp_cov_is_diagonal = bool(np.all(off == 0.0))
        exp_var_np = np.diagonal(expcov_np)

        def model_predict(state, x, extra_std):
            """(m, ndim) -> mean (m, nobs), block-diagonal cov (m, nobs, nobs).

            ``extra_std`` (scalar or (m,) array) follows the reference's
            ``_predict`` semantics (src/mcmc.py:153-166): multiplied by
            each sample's LAST parameter column, then added to every
            emulator's predictive PC variance.  The likelihood path always
            passes 0 (the reference zeroes it before use, src/mcmc.py:205,
            281)."""
            m = x.shape[0]
            extra = jnp.asarray(extra_std, dtype=dtype) * x[:, -1]
            mean = jnp.zeros((m, nobs), dtype=dtype)
            cov = jnp.zeros((m, nobs, nobs), dtype=dtype)
            for e, bstate, i0, i1 in zip(
                emus, state["blocks"], offsets[:-1], offsets[1:]
            ):
                mu_i, cov_i = e.predict_fn_pure(bstate["emu"], x, extra)
                mean = mean.at[:, i0:i1].set(mu_i)
                cov = cov.at[:, i0:i1, i0:i1].set(cov_i)
            return mean, cov

        # --- per-emulator likelihood strategies -----------------------------
        # In PCA mode the per-walker covariance is cov_trunc + A^T diag(v) A
        # with A FIXED: only the npc (~4) PC variances v vary per walker.
        # With C0 = cov_trunc + diag(exp var) precomputed once, Woodbury +
        # the matrix-determinant lemma give the exact log-likelihood from one
        # (n x n) matvec and an (npc x npc) solve per walker -- O(n^2)
        # instead of the reference's O(n^3) per-walker Cholesky
        # (src/mcmc.py:23-65).  Diagonal-covariance modes (perform_no_PCA,
        # exp_and_cov_diagonal) use the O(n) diagonal fast path.  Dense
        # experimental covariance falls back to the stitched Cholesky.
        #
        # Call convention: every strategy is a pure fn (block_state, x) so the
        # jitted programs take ALL arrays as arguments -- closure-captured
        # device arrays pay a ~25 ms per-call re-upload penalty on this
        # runtime (see models/emulator.py predict section).
        def make_lowrank_block(e, i0, i1):
            """PC-space Woodbury likelihood (exact; round-5 reduction).

            With ``cov(x) = C0' + A^T diag(v) A`` (``C0' = cov_trunc +
            diag(exp var)``, A fixed) and ``mean(x) = gp_mean @ A +
            shift``, every n-space piece of the likelihood collapses into
            PC space: expand around ``p0``, the C0'^-1-metric projection
            of the data residual onto rowspace(A), so the cross term
            vanishes (``A C0'^-1 r_perp = 0``) and, with ``d = gp_mean -
            p0`` and ``M = A C0'^-1 A^T``::

                y C0'^-1 y^T = d M d^T + const2   (const2 = r_perp's
                                                   residual, precomputed)
                u = y C0'^-1 A^T = d M

            The (m, n_e) observable mean, the exp-block subtraction and
            the O(n_e^2)-per-walker ``c0_inv`` matvec never exist on the
            device -- the whole per-walker epilogue beyond the GP predict
            is O(npc^2), and the block state drops the (n_e, n_e)/(npc,
            n_e) device matrices.  Same exact likelihood as the
            reference's stitched Cholesky (src/mcmc.py:23-65, 214),
            algebraically reduced; pinned by
            test_chain_log_posterior_matches_manual.
            """
            a_mat, cov_trunc = e.lowrank_parts()
            a64 = np.asarray(a_mat, dtype=np.float64)
            c0 = np.asarray(cov_trunc, dtype=np.float64) + np.diag(
                exp_var_np[i0:i1].astype(np.float64)
            )
            c0_chol = np.linalg.cholesky(c0)
            logdet_c0 = 2.0 * np.sum(np.log(np.diag(c0_chol)))
            c0_inv = np.linalg.inv(c0)
            g = a64 @ c0_inv                     # (npc, n)
            m_mat = g @ a64.T                    # (npc, npc)
            npc = a64.shape[0]
            shift = np.asarray(e.scaler.mean, dtype=np.float64)
            r0 = shift - expdata_np[i0:i1].astype(np.float64)
            # expansion point: kills the cross term (A c0_inv r_perp = 0),
            # so q0 = d M d^T + const2 is a sum of two nonnegative pieces
            # -- strictly LESS f32 cancellation than the old (mean - exp)
            # subtraction path
            p0 = -np.linalg.solve(m_mat, g @ r0)
            r_perp = r0 + p0 @ a64
            const2 = float(r_perp @ c0_inv @ r_perp)
            bstate = {
                "emu": e.predict_state,
                "p0": jnp.asarray(p0, dtype=dtype),
                "m": jnp.asarray(m_mat, dtype=dtype),
                "const2": jnp.asarray(const2, dtype=dtype),
                "logdet_c0": jnp.asarray(logdet_c0, dtype=dtype),
                "eye_npc": jnp.asarray(np.eye(npc, dtype=np_dtype)),
            }
            # reverse-mode-optimized predict when the emulator provides it
            # (halves the gradient's matmul cost for HMC/Langevin; identical
            # values and reverse gradients -- see models/gp._norm_mean_var)
            predict_raw = getattr(
                e, "predict_pc_raw_pure_fastgrad", None
            ) or e.predict_pc_raw_pure

            def block_ll(bs, x_safe):
                gp_mean, v = predict_raw(bs["emu"], x_safe)  # (b, npc) x2
                d = gp_mean - bs["p0"]
                u = d @ bs["m"]                              # (b, npc)
                q0 = jnp.sum(d * u, axis=1) + bs["const2"]
                # floor strictly above 0: d/dv sqrt(v) at the max(v, 0)
                # clamp is +inf, so an f32 PC variance that cancels to <= 0
                # near a training point would inject NaN into HMC/Langevin
                # gradients (silently rejected trajectories, stuck walkers);
                # below the floor the clamp's gradient is exactly 0
                sv = jnp.sqrt(jnp.maximum(v, 1e-22))
                s = bs["eye_npc"] + sv[:, :, None] * bs["m"] * sv[:, None, :]
                # statically-unrolled capacitance solve: S is (b, npc, npc)
                # with eigenvalues >= 1 (I + PSD), and XLA's batched
                # cholesky/cho_solve While-loops cost 3.9 ms in-scan at
                # (1024, 4, 4) -- 65% of the whole posterior eval (v5e);
                # the unroll is fused elementwise work (see ops.linalg)
                corr, logdet_s = spd_qform_logdet(s, sv * u)
                logdet = bs["logdet_c0"] + logdet_s
                lp = -0.5 * (q0 - corr) - 0.5 * logdet
                return jnp.where(jnp.isfinite(lp), lp, -jnp.inf)

            return block_ll, bstate

        def make_diag_block(e, i0, i1):
            bstate = {
                "emu": e.predict_state,
                "exp_block": jnp.asarray(expdata_np[i0:i1]),
                "exp_var_block": jnp.asarray(exp_var_np[i0:i1]),
            }
            predict_diag = e.predict_diag_pure

            def block_ll(bs, x_safe):
                mean, var = predict_diag(bs["emu"], x_safe)
                y = mean - bs["exp_block"]
                return mvn_loglike_diagcov_batch(y, var + bs["exp_var_block"])

            return block_ll, bstate

        def make_cholesky_block(e, i0, i1):
            bstate = {
                "emu": e.predict_state,
                "exp_block": jnp.asarray(expdata_np[i0:i1]),
                "exp_var_block": jnp.asarray(exp_var_np[i0:i1]),
            }
            predict_full = e.predict_fn_pure

            def block_ll(bs, x_safe):
                mu_i, cov_i = predict_full(
                    bs["emu"], x_safe, jnp.zeros((x_safe.shape[0],), dtype=dtype)
                )
                dy = mu_i - bs["exp_block"]
                cov_i = cov_i + jnp.diag(bs["exp_var_block"])
                # Pallas fused kernel on TPU f32, XLA elsewhere
                return mvn_loglike_best(dy, cov_i)

            return block_ll, bstate

        def pick_block(e, i0, i1):
            if getattr(e, "has_lowrank_cov", False) and hasattr(
                e, "predict_pc_raw_pure"
            ):
                return make_lowrank_block(e, i0, i1)
            if getattr(e, "perform_no_PCA_", False) or getattr(
                e, "exp_and_cov_diagonal_", False
            ):
                return make_diag_block(e, i0, i1)
            return make_cholesky_block(e, i0, i1)

        mode = self.likelihood_mode  # validated by the property setter
        use_stitched = (not exp_cov_is_diagonal) or mode == "stitched"
        block_fns: list = []
        block_states: list = []
        if use_stitched:
            for e, i0, i1 in zip(emus, offsets[:-1], offsets[1:]):
                block_states.append({"emu": e.predict_state})
        else:
            maker = pick_block if mode == "auto" else make_cholesky_block
            for e, i0, i1 in zip(emus, offsets[:-1], offsets[1:]):
                fn, bs = maker(e, i0, i1)
                block_fns.append(fn)
                block_states.append(bs)

        self._like_state = {
            "lo": lo,
            "hi": hi,
            "expdata": expdata,
            "expcov": expcov,
            "blocks": tuple(block_states),
            "log_prior_inside": log_prior_inside,
        }

        def loglike_core_blocked(state, x):
            """Likelihood factorized over per-emulator covariance blocks."""
            x_safe = jnp.clip(x, state["lo"], state["hi"])
            ll = jnp.zeros((x.shape[0],), dtype=dtype)
            for fn, bs in zip(block_fns, state["blocks"]):
                ll = ll + fn(bs, x_safe)
            return ll + _EXTRA_STD_CONST

        def loglike_core_stitched(state, x):
            """Full stitched-covariance likelihood (dense exp covariance)."""
            x_safe = jnp.clip(x, state["lo"], state["hi"])
            mean, cov = model_predict(state, x_safe, jnp.zeros((), dtype=dtype))
            dy = mean - state["expdata"]
            cov = cov + state["expcov"]
            return mvn_loglike_best(dy, cov) + _EXTRA_STD_CONST

        # Clamping note: outside points are masked to -inf/-1e300 anyway, and
        # clamping keeps extreme proposals (e.g. SMC latent-space excursions)
        # numerically safe inside the emulator.
        loglike_core = (
            loglike_core_stitched if use_stitched else loglike_core_blocked
        )

        # The reference's finite floor is -1e300 (src/mcmc.py:196-198), which
        # overflows to -inf in float32 and would void the "flows cannot
        # digest -inf" contract on TPU; use the widest finite value the
        # working dtype can hold instead.
        # plain Python float: becomes a compile-time literal instead of a
        # closure-captured device array (per-call re-upload penalty)
        finite_floor = (
            -1e300
            if jnp.dtype(dtype) == jnp.float64
            else float(jnp.finfo(dtype).min) / 2
        )

        def log_likelihood(state, x, finite):
            inside = jnp.all((x > state["lo"]) & (x < state["hi"]), axis=1)
            ll = loglike_core(state, x)
            outside_val = finite_floor if finite else -jnp.inf
            return jnp.where(inside, ll, jnp.asarray(outside_val, dtype=dtype))

        def log_prior(state, x):
            inside = jnp.all((x > state["lo"]) & (x < state["hi"]), axis=1)
            return jnp.where(inside, state["log_prior_inside"], -jnp.inf)

        def log_posterior(state, x):
            inside = jnp.all((x > state["lo"]) & (x < state["hi"]), axis=1)
            ll = loglike_core(state, x)
            return jnp.where(inside, ll, -jnp.inf)

        self._device_fns = {
            "log_likelihood": jax.jit(log_likelihood, static_argnames=("finite",)),
            "log_prior": jax.jit(log_prior),
            "log_posterior": jax.jit(log_posterior),
            "log_posterior_traceable": log_posterior,
            "log_likelihood_traceable": log_likelihood,
            "model_predict": jax.jit(model_predict),
        }
        return self._device_fns

    def posterior_with_state(self):
        """(pure_fn, state) pair for samplers: ``pure_fn(state, x) -> (b,)``."""
        fns = self.device_fns
        return fns["log_posterior_traceable"], self._like_state

    @property
    def device_fns(self):
        if self._device_fns is None:
            self._build_device_fns()
        return self._device_fns

    # --------------------------------------------------------- numpy-facing

    def _predict(self, X, extra_std=0.0):
        """Concatenated emulator predictions (reference: src/mcmc.py:153-166).

        ``extra_std`` is passed through with reference semantics: a scalar
        or per-sample array, multiplied by each sample's last parameter
        column before entering every emulator's predictive covariance
        (``extra_std * X[:, -1]``, exactly src/mcmc.py:157 -- the
        reference's own log_likelihood passes a length-m zeros array)."""
        X = jnp.atleast_2d(jnp.asarray(X, dtype=self._dtype))
        extra = jnp.asarray(extra_std, dtype=self._dtype)
        if extra.ndim > 1 or (extra.ndim == 1 and extra.shape[0] != X.shape[0]):
            raise ValueError(
                f"extra_std must be a scalar or length-{X.shape[0]} array, "
                f"got shape {extra.shape}"
            )
        mean, cov = self.device_fns["model_predict"](self._like_state, X, extra)
        return np.asarray(mean), np.asarray(cov)

    def log_prior(self, X):
        X = np.atleast_2d(np.asarray(X, dtype=float))
        lp = np.full(X.shape[0], -np.inf)
        inside = np.all((X > self.min) & (X < self.max), axis=1)
        lp[inside] = np.log(1.0 / self.prior_volume_)
        return lp

    def log_likelihood(self, X, extra_std_prior_scale: float = 0.001, finite: bool = False):
        X = jnp.atleast_2d(jnp.asarray(X, dtype=self._dtype))
        return np.asarray(
            self.device_fns["log_likelihood"](self._like_state, X, finite)
        )

    def log_posterior(self, X, extra_std_prior_scale: float = 0.05):
        X = jnp.atleast_2d(jnp.asarray(X, dtype=self._dtype))
        return np.asarray(self.device_fns["log_posterior"](self._like_state, X))

    def log_likelihood_point_by_point(self, X, extra_std_prior_scale: float = 0.001):
        """Kept for API parity; the batch path is identical here
        (reference loops per point, src/mcmc.py:225-258)."""
        return self.log_likelihood(X, extra_std_prior_scale)

    def random_pos(self, n: int = 1, seed=None):
        rng = np.random.default_rng(seed)
        return rng.uniform(self.min, self.max, (n, self.ndim))

    @staticmethod
    def map(f, args):
        """Vectorized-pool shim kept for API parity (src/mcmc.py:335-342)."""
        return f(args)

    # ----------------------------------------------------------------- emcee

    @staticmethod
    def _mesh_tools(devices, mesh, nwalkers=None, what="walkers"):
        """Resolve the one-knob device mesh and return (shard, replicate)
        callables (identity when unsharded).  Replaces the reference's
        ``pool=N`` process-pool ergonomics (src/mcmc.py:775-804) with a
        device count: ``devices=N`` shards the walker/particle axis over the
        first N devices (``-1``: all devices)."""
        from ..parallel.mesh import (
            check_divisible,
            replicate,
            resolve_mesh,
            shard_batch,
        )

        m = resolve_mesh(devices, mesh)
        if m is None:
            ident = lambda a: a  # noqa: E731
            return None, ident, ident
        if nwalkers is not None:
            check_divisible(m, nwalkers, what)
        return (
            m,
            lambda a: shard_batch(m, a),
            lambda tree: replicate(m, tree),
        )

    def _validate_resume_chain(self, prev: np.ndarray) -> None:
        """Check a stored chain satisfies the walker-chain resume contract
        ``(nwalkers, nsteps, ndim)`` (shared by run_mcmc and run_MCMC_HMC).
        A flat 2-D chain (written by run_pocoMC) cannot seed walker
        restarts."""
        if prev.ndim != 3:
            raise ValueError(
                f"existing chain at {self.mcmc_path} has shape "
                f"{prev.shape}; resume needs the walker-chain contract "
                f"(nwalkers, nsteps, ndim) -- a flat 2-D chain was "
                f"likely written by run_pocoMC and cannot seed walker "
                f"restarts"
            )
        if prev.shape[2] != self.ndim:
            raise ValueError(
                f"existing chain has ndim={prev.shape[2]}, "
                f"posterior has ndim={self.ndim}"
            )

    def run_mcmc(
        self,
        nsteps: int = 500,
        nburnsteps: int | None = None,
        nwalkers: int | None = None,
        status=None,
        nthin: int = 10,
        seed: int = 0,
        skip_initial_state_check: bool = False,
        move: str = "stretch",
        devices: int | None = None,
        mesh=None,
    ):
        """Ensemble-MCMC calibration with emcee semantics
        (reference: src/mcmc.py:345-426): two-phase burn-in with walker
        resampling at the top-lnprob unique points, thinning, and
        resume-by-append from an existing chain pickle.

        ``move``: ``"stretch"`` (reference default), ``"de"``,
        ``"snooker"``, or ``"de-snooker"`` (the classic 80/20 DE+snooker
        mixture) -- see :mod:`.ensemble` for the kernel definitions.

        ``devices``/``mesh``: one-knob multi-device execution -- the walker
        axis is sharded over a 1-D device mesh and the likelihood state
        replicated (results identical to single-device up to float
        reassociation; see :meth:`_mesh_tools`)."""
        chain_data = {}
        try:
            with open(self.mcmc_path, "rb") as f:
                chain_data = pickle.load(f)
        except FileNotFoundError:
            pass
        burn_flag = "chain" not in chain_data
        if not burn_flag:
            self._validate_resume_chain(np.asarray(chain_data["chain"]))
        if nburnsteps is None or nwalkers is None:
            logger.error("must specify nburnsteps and nwalkers to start chain")
            return

        log_post, like_state = self.posterior_with_state()
        dtype = self._dtype
        key = jax.random.PRNGKey(seed)
        logger.info("Starting MCMC ...")

        n_resume = (
            chain_data["chain"].shape[0] if "chain" in chain_data else None
        )
        mesh, shard, repl = self._mesh_tools(
            devices, mesh, nwalkers if burn_flag else n_resume
        )
        if mesh is not None:
            like_state = repl(like_state)

        if burn_flag:
            logger.info("no existing chain found, starting initial burn-in")
            nburn0 = nburnsteps // 2
            key, k1, k2, k3 = jax.random.split(key, 4)
            x0 = shard(jnp.asarray(self.random_pos(nwalkers, seed=seed), dtype=dtype))
            if not skip_initial_state_check:
                self._check_initial_state(like_state, x0)
            logger.info("running %d walkers for %d steps", nwalkers, nburn0)
            res = self._run_segments(
                log_post, like_state, x0, nburn0, k1, status, move
            )

            logger.info("resampling walker positions")
            flat = np.asarray(res.chain).reshape(-1, self.ndim)
            flat_lp = np.asarray(res.log_prob).reshape(-1)
            # top-lnprob unique points (reference: src/mcmc.py:392-397)
            uniq_idx = np.unique(flat_lp, return_index=True)[1][-nwalkers:]
            x0_np = flat[uniq_idx]
            if x0_np.shape[0] < nwalkers:  # degenerate: pad by repeating best
                reps = nwalkers - x0_np.shape[0]
                x0_np = np.concatenate([x0_np, np.repeat(x0_np[-1:], reps, axis=0)])
            x0 = shard(jnp.asarray(x0_np, dtype=dtype))

            nburn1 = nburnsteps - nburn0
            logger.info("running %d walkers for %d steps", nwalkers, nburn1)
            res = self._run_segments(
                log_post, like_state, x0, nburn1, k2, status, move
            )
            x0 = res.final_state
            logger.info("burn-in complete, starting production")
            prod_key = k3
        else:
            logger.info("restarting from last point of existing chain")
            x0 = shard(jnp.asarray(chain_data["chain"][:, -1, :], dtype=dtype))
            if not skip_initial_state_check:
                self._check_initial_state(like_state, x0)
            # fold the stored chain length into the key (same scheme and
            # rationale as run_MCMC_HMC): split(key, 2)[1] equals the fresh
            # run's burn-in phase key AND is identical on every
            # continuation, so same-seed resumed segments would replay one
            # random stream and cross-correlate the appended chain
            prod_key = jax.random.fold_in(
                key, (1 << 20) + chain_data["chain"].shape[1]
            )

        logger.info("running %d walkers for %d steps", x0.shape[0], nsteps)
        res = self._run_segments(
            log_post, like_state, x0, nsteps, prod_key, status, move
        )

        self._append_and_write_chain(chain_data, res.chain, nthin)
        return res

    def _append_and_write_chain(self, chain_data, res_chain, nthin):
        """Thin the sampler output, append under the resume contract, and
        persist.  Thinning happens on the HOST copy (np.asarray first):
        slicing the device array would launch an eager strided-gather
        program whose remote compile costs seconds on this runtime
        (CLAUDE.md) for work the host does for free.  Dumps the FULL dict
        so extra keys written alongside the chain survive a resume."""
        thinned = np.asarray(res_chain)[:, ::nthin, :]
        if "chain" in chain_data:
            chain_data["chain"] = np.concatenate(
                (chain_data["chain"], thinned), axis=1
            )
        else:
            chain_data["chain"] = thinned
        self.chain = chain_data["chain"]
        logger.info("writing chain to file")
        with open(self.mcmc_path, "wb") as f:
            pickle.dump(chain_data, f)

    def _check_initial_state(self, like_state, x0):
        """emcee's initial-state check (skipped via
        ``skip_initial_state_check=True``, same kwarg as emcee): every
        starting walker must have a finite log-posterior, and the ensemble
        must be linearly independent (a degenerate ensemble breaks the
        stretch move's affine invariance).

        Uses the JITTED posterior program: evaluating the traceable form
        eagerly would pay this runtime's multi-second remote compile per op
        (see CLAUDE.md), turning the check into minutes of startup cost."""
        lp0 = np.asarray(
            self.device_fns["log_posterior"](like_state, x0)
        )
        n_bad = int(np.sum(~np.isfinite(lp0)))
        if n_bad:
            raise ValueError(
                f"{n_bad} of {len(lp0)} initial walkers have non-finite "
                "log-posterior; fix the starting state or pass "
                "skip_initial_state_check=True"
            )
        x_np = np.asarray(x0, dtype=np.float64)
        centered = x_np - x_np.mean(axis=0)
        rank = np.linalg.matrix_rank(centered)
        if rank < min(self.ndim, x_np.shape[0] - 1):
            raise ValueError(
                "initial walker ensemble is linearly dependent (rank "
                f"{rank} < {min(self.ndim, x_np.shape[0] - 1)}); the stretch "
                "move cannot explore the full space from it; pass "
                "skip_initial_state_check=True to bypass"
            )

    @staticmethod
    def _log_acceptance(res):
        af = np.asarray(res.acceptance)
        logger.info(
            "acceptance fraction: mean %.4f, std %.4f, min %.4f, max %.4f",
            af.mean(), af.std(), af.min(), af.max(),
        )

    def _run_segments(self, log_post, like_state, x0, nsteps, key, status,
                      move: str = "stretch"):
        """Run ``nsteps`` ensemble steps, logging acceptance every ``status``
        steps (reference: LoggingEnsembleSampler, src/mcmc.py:75-90;
        ``status=None`` defaults to ~10% of the segment as the reference
        does at src/mcmc.py:77-78).

        Chunks are uniform so at most two scan lengths compile.  Returns the
        concatenated EnsembleResult-equivalent pieces.
        """
        from .ensemble import EnsembleResult

        if status is None:
            status = max(nsteps // 10, 1)
        if not status or status >= nsteps:
            res = run_ensemble(
                log_post, x0, nsteps, key, state=like_state, move=move
            )
            self._log_acceptance(res)
            return res
        chains, lps = [], []
        done = 0
        state_x = x0
        accs = []
        while done < nsteps:
            chunk = min(status, nsteps - done)
            # same base key + absolute step offset: the chunked run
            # consumes the identical per-step stream as the unchunked one,
            # so the status LOG cadence cannot change the sampled chain
            res = run_ensemble(
                log_post, state_x, chunk, key, state=like_state, move=move,
                step_offset=done,
            )
            done += chunk
            logger.info("step %d:", done)
            self._log_acceptance(res)
            chains.append(np.asarray(res.chain))
            lps.append(np.asarray(res.log_prob))
            accs.append(np.asarray(res.acceptance) * chunk)
            state_x = res.final_state
        return EnsembleResult(
            chain=jnp.asarray(np.concatenate(chains, axis=1)),
            log_prob=jnp.asarray(np.concatenate(lps, axis=1)),
            acceptance=jnp.asarray(sum(accs) / nsteps),
            final_state=res.final_state,
            final_log_prob=res.final_log_prob,
        )

    # ------------------------------------------------------------- rescoring

    def compute_log_likelihood_for_chain(
        self, output_path: str = "./mcmc/log_likelihood.pkl", batch_size: int = 4096
    ):
        """Re-score a saved chain pointwise (reference: src/mcmc.py:729-749),
        batched on device instead of a Python loop."""
        if self.chain is False:
            logger.error("Load chain before computing log likelihood")
            with open(self.mcmc_path, "rb") as f:
                self.chain = pickle.load(f)["chain"]
        logger.info("Computing log likelihood for the chain...")
        chain = np.asarray(self.chain)
        flat = chain.reshape(-1, self.ndim)
        out = np.empty(flat.shape[0])
        for i in range(0, flat.shape[0], batch_size):
            out[i : i + batch_size] = self.log_likelihood(flat[i : i + batch_size])
        # walker chains score as (nwalkers, nsteps) (reference contract,
        # src/mcmc.py:745-747); a flat pocoMC chain (nsamples, ndim) has no
        # walker axis and scores as (nsamples,)
        likelihood = (
            out.reshape(chain.shape[0], chain.shape[1])
            if chain.ndim == 3
            else out
        )
        with open(output_path, "wb") as f:
            pickle.dump({"log_likelihood": likelihood}, f)
        return likelihood

    def convergence_report(self, rhat_threshold: float = 1.01) -> dict:
        """Convergence diagnostics for the stored MCMC chain: rank-normalized
        split-R-hat, integrated autocorrelation times, and ESS (see
        :func:`..utils.metrics.convergence_diagnostics`).  Beyond-reference:
        the reference judges convergence by eye from trace plots.  Applies
        to the equally-weighted samplers (``run_mcmc``/``run_MCMC_HMC``/
        ``run_MCMC_PTLMC``); ``run_pocoMC``'s weighted posterior has no
        walker-time structure to diagnose (its ESS comes from the importance
        weights instead)."""
        from ..utils.metrics import convergence_diagnostics

        if self.chain is False:
            with open(self.mcmc_path, "rb") as f:
                self.chain = pickle.load(f)["chain"]
        arr = np.asarray(self.chain)
        if arr.ndim != 3:
            # a run_pocoMC chain is a flat (nsamples, ndim) weighted sample
            # -- without this check it would die on a bare IndexError deep
            # inside the metrics module
            raise ValueError(
                f"convergence_report needs a (nwalkers, nsteps, ndim) chain "
                f"from run_mcmc/run_MCMC_HMC/run_MCMC_PTLMC, got shape "
                f"{arr.shape}; run_pocoMC posteriors are weighted samples "
                "with no walker-time structure (their ESS comes from the "
                "importance weights -- see run_pocoMC's result dict)"
            )
        rep = convergence_diagnostics(arr, rhat_threshold=rhat_threshold)
        logger.info(
            "Convergence: max rhat %.4f, max tau %.1f, ESS %.0f, %s",
            float(np.max(rep["rhat"])), float(np.nanmax(rep["tau"])), rep["ess"],
            "CONVERGED" if rep["converged"] else "NOT CONVERGED",
        )
        return rep

    # ---------------------------------------------------------------- PTLMC

    def run_MCMC_PTLMC(
        self,
        nsteps: int = 500,
        nwalkers: int = 16,
        ntemps: int = 50,
        maxtemp: float = 100.0,
        nstartparameters: int = 1000,
        seed: int = 0,
        use_gradients: bool = False,
        devices: int | None = None,
        mesh=None,
    ):
        """Parallel-tempered Langevin MC (reference: src/mcmc.py:431-726).

        ``use_gradients=True`` turns on the true Langevin drift (the
        reference's gradient branch, unusable there because its posterior
        has no gradients; ours is differentiable).  ``devices``/``mesh``:
        shard the (ntemps + nwalkers) chain axis over a device mesh (see
        :meth:`_mesh_tools`)."""
        from .ptlmc import run_ptlmc

        logger.info("Starting MCMC ...")
        log_post, like_state = self.posterior_with_state()
        mesh, _, _ = self._mesh_tools(
            devices, mesh, ntemps + nwalkers, "chains (ntemps + nwalkers)"
        )
        theta = run_ptlmc(
            log_post,
            lambda n: jnp.asarray(self.random_pos(n, seed=seed), dtype=self._dtype),
            numtemps=ntemps,
            numchain=nwalkers,
            sampperchain=nsteps,
            maxtemp=maxtemp,
            nstartparameters=nstartparameters,
            key=jax.random.PRNGKey(seed),
            state=like_state,
            use_gradients=use_gradients,
            mesh=mesh,
        )
        self.chain = np.asarray(theta).reshape((nwalkers, nsteps, self.ndim))
        logger.info("Writing MCMC chains to file...")
        with open(self.mcmc_path, "wb") as f:
            pickle.dump({"chain": self.chain}, f)

    # ----------------------------------------------------------------- HMC

    def run_MCMC_HMC(
        self,
        nsteps: int = 500,
        nwalkers: int = 256,
        nburnsteps: int | str = "auto",
        n_leapfrog: int | str | None = None,
        nthin: int = 1,
        seed: int = 0,
        target_accept: float = 0.8,
        traj_jitter: int = 1,
        devices: int | None = None,
        mesh=None,
        resume: bool = False,
        warm_start=None,
        scheme: str = "auto",
        window: int | None = None,
        persist: float = 0.0,
        warmup_walkers: int | str | None = "auto",
    ):
        """Preconditioned Hamiltonian MC (beyond-reference sampler).

        Exact gradients of the fused posterior program power leapfrog
        trajectories in a whitened, logit-unconstrained space; samples come
        out nearly independent (tau ~ 1.9 on the flagship posterior vs a
        window-growing ~60-90+ for the ensemble moves) -- the measured
        ESS/s winner (see :mod:`.hmc`).  Best suited to unimodal
        posteriors: like any single-chain gradient kernel it will not hop
        between well-separated modes (use ``run_pocoMC`` for those).
        ``nburnsteps`` is the per-phase
        warmup length (two windowed adaptation phases: metric, then step
        size); ``nburnsteps="auto"`` lets each phase terminate itself as
        soon as the dual-averaged step size has stabilized with acceptance
        on target (32-256 steps; see :func:`.hmc.run_hmc`), so no
        hand-picked count is needed.  ``n_leapfrog="auto"`` adds a third
        phase that calibrates
        the trajectory length to this posterior (per-length AR(1) mixing
        score — effective samples per gradient; see :func:`.hmc.run_hmc`).
        ``n_leapfrog=None`` (default) means 8 for a fresh run but INHERITS
        the calibrated length from ``warm_start`` when one is given (an
        explicit integer always wins, matching :func:`.hmc.run_hmc`'s
        override contract).  Writes the
        standard chain contract
        ``{"chain": (nwalkers, ceil(nsteps/nthin), ndim)}`` (stride
        slicing keeps the first of each ``nthin`` block, so a non-divisible
        ``nsteps`` rounds UP).

        ``resume=True`` continues an existing chain pickle: walkers restart
        from its last samples (the file's walker count wins over
        ``nwalkers``) and the new thinned samples are APPENDED, mirroring
        :meth:`run_mcmc`'s reference resume contract.  ``warm_start``
        (an :class:`.hmc.HMCResult` from a previous call on this posterior)
        additionally skips ALL adaptation phases by reusing the adapted
        metric/step size/trajectory length -- ``resume=True,
        warm_start=prev`` makes continuation cost zero warmup gradients.
        When ``warm_start`` is given but no chain pickle exists (wrong
        path, deleted file, or ``resume=False``), walkers start from
        ``warm_start.final_state`` rather than fresh prior draws, since no
        burn-in runs when adaptation is skipped.

        ``scheme``: production transition kernel.  The default ``"auto"``
        resolves itself from the adapted acceptance: at >= 0.75 it runs
        the measured-best configuration -- ``"windowed"`` (Neal 1994
        windowed HMC) with Horowitz persistent momentum (persist 0.7) --
        and falls back to classic endpoint MH otherwise, so the
        no-knob call gets the headline-bench kernel whenever the
        posterior supports it.  Explicit choices: ``"mh"`` (classic
        endpoint Metropolis), ``"windowed"`` (window-sum accept/reject
        plus Boltzmann selection within the chosen window -- same
        gradient cost, higher acceptance, and rejections resample the
        start window instead of repeating the current point), or
        ``"multinomial"`` (full-trajectory Boltzmann baseline; its
        distance-agnostic selection measurably shortens moves, prefer
        ``"windowed"``).  ``warmup_walkers`` runs the adaptation phases
        on a walker subset and tiles the warmed state up for production
        -- cuts the warmup gradient bill proportionally; the default
        ``"auto"`` resolves to ``min(256, nwalkers)`` (the measured
        flagship optimum), ``None`` keeps the full batch; see
        :func:`.hmc.run_hmc`.  ``window`` sizes the windowed
        scheme's accept/reject windows (default ``min(2, (L+1)//2)``, the
        measured flagship optimum).  ``persist`` (windowed/auto only)
        enables partial momentum refresh between steps (Horowitz
        generalized HMC; 0.0 = classic full refresh, which under
        ``"auto"`` means "pick 0.7 when windowed is chosen").  See
        :func:`.hmc.run_hmc`.
        """
        from .hmc import run_hmc

        if n_leapfrog is None:
            # default: 8 fresh, but inherit a warm-started (possibly
            # auto-calibrated) length -- "auto" with warm_start reuses
            # warm_start.n_leapfrog without re-probing (run_hmc contract)
            n_leapfrog = "auto" if warm_start is not None else 8
        logger.info("Starting HMC ...")
        chain_data = {}
        if resume:
            try:
                with open(self.mcmc_path, "rb") as f:
                    chain_data = pickle.load(f)
            except FileNotFoundError:
                pass
        log_post, like_state = self.posterior_with_state()
        if "chain" in chain_data:
            prev = np.asarray(chain_data["chain"])
            self._validate_resume_chain(prev)
            logger.info("restarting from last point of existing chain")
            nwalkers = prev.shape[0]
            x0 = jnp.asarray(prev[:, -1, :], dtype=self._dtype)
            # fold the stored length into the key: a resumed run with the
            # same seed must NOT replay the fresh run's momenta.  The large
            # offset keeps the folded index clear of the fresh run's own
            # fold_in/split indices (on threefry fold_in(k, i) ==
            # split(k, n)[i] for i < n, so short stored chains would
            # otherwise replay the fresh run's phase keys).
            key = jax.random.fold_in(
                jax.random.PRNGKey(seed), (1 << 20) + prev.shape[1]
            )
        elif warm_start is not None:
            # warm_start skips ALL adaptation and burn-in, so random prior
            # draws would be written straight into the chain as production
            # samples; continue from the previous run's final walkers instead
            if resume:
                logger.warning(
                    "resume=True but no chain found at %s; continuing from "
                    "warm_start's final walker positions", self.mcmc_path,
                )
            fs = np.asarray(warm_start.final_state)
            if fs.ndim != 2 or fs.shape[1] != self.ndim:
                raise ValueError(
                    f"warm_start.final_state has shape {fs.shape}, "
                    f"expected (nwalkers, {self.ndim})"
                )
            nwalkers = fs.shape[0]
            x0 = jnp.asarray(fs, dtype=self._dtype)
            key = _warm_fallback_key(seed, fs)
        else:
            x0 = jnp.asarray(
                self.random_pos(nwalkers, seed=seed), dtype=self._dtype
            )
            key = jax.random.PRNGKey(seed)
        mesh, _, _ = self._mesh_tools(devices, mesh, nwalkers)
        if isinstance(warmup_walkers, str):
            if warmup_walkers != "auto":
                raise ValueError(
                    f"warmup_walkers must be an int, None, or 'auto', "
                    f"got {warmup_walkers!r}"
                )
            # measured flagship optimum: a 256-walker adaptation subset
            # (tiled up for production) cuts the warmup gradient bill
            # without hurting tau; clamp to the actual batch, and keep
            # mesh divisibility when sharded
            warmup_walkers = min(256, nwalkers)
            if mesh is not None and warmup_walkers % mesh.size != 0:
                warmup_walkers = None  # full batch: always divisible here
        res = run_hmc(
            log_post, x0, nsteps, key,
            state=like_state, lo=self.min, hi=self.max,
            n_leapfrog=n_leapfrog, warmup=nburnsteps,
            target_accept=target_accept, traj_jitter=traj_jitter,
            mesh=mesh, warm_start=warm_start, scheme=scheme, window=window,
            persist=persist, warmup_walkers=warmup_walkers,
        )
        logger.info(
            "HMC: step size %.4f, n_leapfrog %d, mean accept %.3f",
            res.step_size, res.n_leapfrog,
            float(np.mean(np.asarray(res.acceptance))),
        )
        self._append_and_write_chain(chain_data, res.chain, nthin)
        return res

    # ----------------------------------------------------------------- SMC

    def run_pocoMC(
        self,
        n_effective: int = 1000,
        n_active: int = 250,
        n_prior: int = 2000,
        sample: str = "tpcn",
        n_max_steps: int = 200,
        random_state: int = 42,
        n_total: int = 5000,
        n_evidence: int = 5000,
        pool=None,
        prior=None,
        devices: int | None = None,
        mesh=None,
        resume: bool = False,
        checkpoint: bool = True,
    ):
        """Flow-preconditioned SMC with pocoMC semantics
        (reference: src/mcmc.py:752-819).

        ``devices``/``mesh``: one-knob multi-device execution -- the
        particle axis is sharded over a 1-D device mesh (see
        :meth:`_mesh_tools`).  ``pool`` (the reference's process count,
        src/mcmc.py:775-804) maps onto the same knob: an integer ``pool``
        with no explicit ``devices``/``mesh`` requests ``min(pool,
        available)`` devices when the particle counts divide evenly, and
        logs + falls back to single-device otherwise (reference scripts
        passing ``pool=12`` keep working unchanged).

        ``checkpoint`` (default on): the sampler state is atomically
        serialized to ``smc_checkpoint.pkl`` next to ``mcmc_path`` after
        every completed iteration; ``resume=True`` continues a killed run
        from that state (same knobs required -- a mismatch raises), with
        an evolution identical to the uninterrupted run.  This mirrors
        the reference's chain-resume axis (src/mcmc.py:354-364) for the
        one sampler whose production runs take minutes of wall clock."""
        from .smc import run_smc
        from ..utils.priors import ScipyPrior

        if resume and not checkpoint:
            # run_smc's resume requires a checkpoint_path; silently
            # restarting a killed production run from scratch is the one
            # outcome this feature exists to prevent -- fail before any
            # work happens
            raise ValueError(
                "resume=True requires checkpoint=True (the resume state "
                "IS the checkpoint file)"
            )
        if devices is None and mesh is None and isinstance(pool, int) and pool > 1:
            n_dev = min(pool, len(jax.devices()))
            if n_dev > 1 and all(
                n % n_dev == 0 for n in (n_prior, n_active, n_evidence or n_dev)
            ):
                devices = n_dev
                logger.info(
                    "pool=%d mapped to %d-device particle sharding", pool, n_dev
                )
            elif n_dev > 1:
                logger.info(
                    "pool=%d ignored: particle counts not divisible by %d "
                    "devices (pass devices=/mesh= explicitly to force)",
                    pool, n_dev,
                )

        if prior is not None and not hasattr(prior, "log_prior_jax"):
            # the reference builds pocoMC priors from lists of frozen scipy
            # distributions (src/mcmc.py:784-789); convert those natively
            if isinstance(prior, (list, tuple)):
                prior = ScipyPrior(prior)
            elif hasattr(prior, "dists"):
                prior = ScipyPrior(prior.dists)
        if prior is not None and getattr(prior, "dim", self.ndim) != self.ndim:
            raise ValueError("prior.dim does not match the model parameter space")

        logger.info("Starting preconditioned SMC ...")
        ll_fn = self.device_fns["log_likelihood_traceable"]
        like_state = self._like_state
        mesh, _, _ = self._mesh_tools(devices, mesh)
        ckpt_path = (
            self.mcmc_path.parent / "smc_checkpoint.pkl" if checkpoint
            else None
        )
        result = run_smc(
            ll_fn,
            jnp.asarray(self.min, dtype=self._dtype),
            jnp.asarray(self.max, dtype=self._dtype),
            likelihood_state=like_state,
            n_effective=n_effective,
            n_active=n_active,
            n_prior=n_prior,
            sample=sample,
            n_max_steps=n_max_steps,
            n_total=n_total,
            n_evidence=n_evidence,
            seed=random_state,
            custom_prior=prior,
            mesh=mesh,
            checkpoint_path=ckpt_path,
            resume=resume,
        )
        logger.info("Log evidence: %s", result["logz"])
        logger.info("Log evidence error: %s", result["logz_err"])
        chain_data = {
            "chain": np.asarray(result["samples"]),
            "weights": np.asarray(result["weights"]),
            "logl": np.asarray(result["logl"]),
            "logp": np.asarray(result["logp"]),
            "logz": float(result["logz"]),
            "logz_err": float(result["logz_err"]),
            # the persistent-sampling estimate/error are always reported
            # alongside (logz/logz_err follow the IS refinement when
            # n_evidence > 0, else they ARE the PS pair)
            "logz_ps": float(result["logz_ps"]),
            "logz_err_ps": float(result["logz_err_ps"]),
            "logz_source": result["logz_source"],
            "logz_is": result["logz_is"],
            "logz_err_is": result["logz_err_is"],
            # PSIS generalized-Pareto tail index of the IS evidence weights
            # (None when n_evidence=0 or the tail was too small to fit)
            "logz_khat": result["logz_khat"],
            # optimal-bridge refinement (robust to flow undercoverage --
            # bounded integrands; see smc._bridge_logz)
            "logz_bridge": result["logz_bridge"],
            "logz_err_bridge": result["logz_err_bridge"],
        }
        self.chain = chain_data["chain"]
        with open(self.mcmc_path, "wb") as f:
            pickle.dump(chain_data, f)
        return chain_data
