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
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import working_dtype
from ..runtime import parse_model_parameter_file
from ..ops.linalg import mvn_loglike_batch
from ..utils.io import load_exp_data_pickle
from .ensemble import run_ensemble

logger = logging.getLogger(__name__)

# 2*log(1e-16): the constant the reference's zeroed extra_std prior adds.
_EXTRA_STD_CONST = 2.0 * np.log(1e-16)


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
        self.prior_volume_ = float(np.prod(self.max - self.min))

        logger.info("Loading the experiment data from %s ...", expdata_path)
        self.expdata, self.expdata_cov = load_exp_data_pickle(expdata_path)
        self.nobs = self.expdata.shape[1]
        self.emuList: list = []
        self.chain = False
        self._dtype = working_dtype()
        self._device_fns = None

    # ------------------------------------------------------------- emulators

    def loadEmulator(self, emulatorPathList):
        """Load trained emulators (paths to :meth:`Emulator.save` files or
        live emulator objects exposing ``predict_device``)."""
        from ..models.emulator import Emulator

        for emu in emulatorPathList:
            if hasattr(emu, "predict_device"):
                self.emuList.append(emu)
            else:
                self.emuList.append(Emulator.load(emu))
        logger.info("Number of Emulators: %d", len(self.emuList))
        self._device_fns = None  # force rebuild

    # ------------------------------------------------------------ device path

    def _build_device_fns(self):
        """Assemble the fused log-likelihood / log-posterior programs."""
        if not self.emuList:
            raise RuntimeError("loadEmulator before evaluating the posterior")
        dtype = self._dtype
        lo = jnp.asarray(self.min, dtype=dtype)
        hi = jnp.asarray(self.max, dtype=dtype)
        expdata = jnp.asarray(self.expdata.flatten(), dtype=dtype)
        expcov = jnp.asarray(self.expdata_cov, dtype=dtype)
        nobs = self.nobs
        log_prior_inside = -jnp.log(
            jnp.asarray(self.prior_volume_, dtype=dtype)
        )
        emus = list(self.emuList)
        offsets = np.cumsum([0] + [e.nobs for e in emus])
        if offsets[-1] != nobs:
            raise ValueError(
                f"emulators predict {offsets[-1]} observables, experimental "
                f"data has {nobs}"
            )

        def model_predict(x):
            """(m, ndim) -> mean (m, nobs), block-diagonal cov (m, nobs, nobs)."""
            m = x.shape[0]
            mean = jnp.zeros((m, nobs), dtype=dtype)
            cov = jnp.zeros((m, nobs, nobs), dtype=dtype)
            for e, i0, i1 in zip(emus, offsets[:-1], offsets[1:]):
                mu_i, cov_i = e.predict_device(x)
                mean = mean.at[:, i0:i1].set(mu_i)
                cov = cov.at[:, i0:i1, i0:i1].set(cov_i)
            return mean, cov

        def loglike_core(x):
            """Unmasked likelihood core for an (m, ndim) batch."""
            # Clamp inputs to the box for the emulator eval: outside points
            # are masked to -inf/-1e300 anyway, and clamping keeps extreme
            # proposals (e.g. SMC latent-space excursions) numerically safe.
            x_safe = jnp.clip(x, lo, hi)
            mean, cov = model_predict(x_safe)
            dy = mean - expdata
            cov = cov + expcov
            return mvn_loglike_batch(dy, cov) + _EXTRA_STD_CONST

        def log_likelihood(x, finite):
            inside = jnp.all((x > lo) & (x < hi), axis=1)
            ll = loglike_core(x)
            outside_val = jnp.asarray(-1e300 if finite else -jnp.inf, dtype=dtype)
            return jnp.where(inside, ll, outside_val)

        def log_prior(x):
            inside = jnp.all((x > lo) & (x < hi), axis=1)
            return jnp.where(inside, log_prior_inside, -jnp.inf)

        def log_posterior(x):
            inside = jnp.all((x > lo) & (x < hi), axis=1)
            ll = loglike_core(x)
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

    @property
    def device_fns(self):
        if self._device_fns is None:
            self._build_device_fns()
        return self._device_fns

    # --------------------------------------------------------- numpy-facing

    def _predict(self, X, extra_std=0.0):
        """Concatenated emulator predictions (reference: src/mcmc.py:153-166)."""
        X = jnp.atleast_2d(jnp.asarray(X, dtype=self._dtype))
        mean, cov = self.device_fns["model_predict"](X)
        return np.asarray(mean), np.asarray(cov)

    def log_prior(self, X):
        X = np.atleast_2d(np.asarray(X, dtype=float))
        lp = np.full(X.shape[0], -np.inf)
        inside = np.all((X > self.min) & (X < self.max), axis=1)
        lp[inside] = np.log(1.0 / self.prior_volume_)
        return lp

    def log_likelihood(self, X, extra_std_prior_scale: float = 0.001, finite: bool = False):
        X = jnp.atleast_2d(jnp.asarray(X, dtype=self._dtype))
        return np.asarray(self.device_fns["log_likelihood"](X, finite))

    def log_posterior(self, X, extra_std_prior_scale: float = 0.05):
        X = jnp.atleast_2d(jnp.asarray(X, dtype=self._dtype))
        return np.asarray(self.device_fns["log_posterior"](X))

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

    def run_mcmc(
        self,
        nsteps: int = 500,
        nburnsteps: int | None = None,
        nwalkers: int | None = None,
        status=None,
        nthin: int = 10,
        seed: int = 0,
        skip_initial_state_check: bool = False,
    ):
        """Ensemble-MCMC calibration with emcee semantics
        (reference: src/mcmc.py:345-426): two-phase burn-in with walker
        resampling at the top-lnprob unique points, thinning, and
        resume-by-append from an existing chain pickle."""
        chain_data = {}
        try:
            with open(self.mcmc_path, "rb") as f:
                chain_data = pickle.load(f)
        except FileNotFoundError:
            pass
        burn_flag = "chain" not in chain_data
        if nburnsteps is None or nwalkers is None:
            logger.error("must specify nburnsteps and nwalkers to start chain")
            return

        log_post = self.device_fns["log_posterior_traceable"]
        dtype = self._dtype
        key = jax.random.PRNGKey(seed)
        logger.info("Starting MCMC ...")

        if burn_flag:
            logger.info("no existing chain found, starting initial burn-in")
            nburn0 = nburnsteps // 2
            key, k1, k2, k3 = jax.random.split(key, 4)
            x0 = jnp.asarray(self.random_pos(nwalkers, seed=seed), dtype=dtype)
            logger.info("running %d walkers for %d steps", nwalkers, nburn0)
            res = run_ensemble(log_post, x0, nburn0, k1)
            self._log_acceptance(res)

            logger.info("resampling walker positions")
            flat = np.asarray(res.chain).reshape(-1, self.ndim)
            flat_lp = np.asarray(res.log_prob).reshape(-1)
            # top-lnprob unique points (reference: src/mcmc.py:392-397)
            uniq_idx = np.unique(flat_lp, return_index=True)[1][-nwalkers:]
            x0 = jnp.asarray(flat[uniq_idx], dtype=dtype)
            if x0.shape[0] < nwalkers:  # degenerate: pad by repeating best
                reps = nwalkers - x0.shape[0]
                x0 = jnp.concatenate([x0, jnp.repeat(x0[-1:], reps, axis=0)])

            nburn1 = nburnsteps - nburn0
            logger.info("running %d walkers for %d steps", nwalkers, nburn1)
            res = run_ensemble(log_post, x0, nburn1, k2)
            self._log_acceptance(res)
            x0 = res.final_state
            logger.info("burn-in complete, starting production")
            prod_key = k3
        else:
            logger.info("restarting from last point of existing chain")
            x0 = jnp.asarray(chain_data["chain"][:, -1, :], dtype=dtype)
            key, prod_key = jax.random.split(key)

        logger.info("running %d walkers for %d steps", x0.shape[0], nsteps)
        res = run_ensemble(log_post, x0, nsteps, prod_key)
        self._log_acceptance(res)

        thinned = np.asarray(res.chain[:, ::nthin, :])
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
        return res

    @staticmethod
    def _log_acceptance(res):
        af = np.asarray(res.acceptance)
        logger.info(
            "acceptance fraction: mean %.4f, std %.4f, min %.4f, max %.4f",
            af.mean(), af.std(), af.min(), af.max(),
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
        flat = self.chain.reshape(-1, self.ndim)
        out = np.empty(flat.shape[0])
        for i in range(0, flat.shape[0], batch_size):
            out[i : i + batch_size] = self.log_likelihood(flat[i : i + batch_size])
        likelihood = out.reshape(self.chain.shape[0], self.chain.shape[1])
        with open(output_path, "wb") as f:
            pickle.dump({"log_likelihood": likelihood}, f)
        return likelihood

    # ---------------------------------------------------------------- PTLMC

    def run_MCMC_PTLMC(
        self,
        nsteps: int = 500,
        nwalkers: int = 16,
        ntemps: int = 50,
        maxtemp: float = 100.0,
        nstartparameters: int = 1000,
        seed: int = 0,
    ):
        """Parallel-tempered Langevin MC (reference: src/mcmc.py:431-726)."""
        from .ptlmc import run_ptlmc

        logger.info("Starting MCMC ...")
        theta = run_ptlmc(
            self.device_fns["log_posterior_traceable"],
            lambda n: jnp.asarray(self.random_pos(n, seed=seed), dtype=self._dtype),
            numtemps=ntemps,
            numchain=nwalkers,
            sampperchain=nsteps,
            maxtemp=maxtemp,
            nstartparameters=nstartparameters,
            key=jax.random.PRNGKey(seed),
        )
        self.chain = np.asarray(theta).reshape((nwalkers, nsteps, self.ndim))
        logger.info("Writing MCMC chains to file...")
        with open(self.mcmc_path, "wb") as f:
            pickle.dump({"chain": self.chain}, f)

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
    ):
        """Flow-preconditioned SMC with pocoMC semantics
        (reference: src/mcmc.py:752-819).  ``pool`` is accepted for API
        parity and ignored (parallelism is on-device)."""
        from .smc import run_smc

        logger.info("Starting preconditioned SMC ...")
        result = run_smc(
            log_likelihood=self.device_fns["log_likelihood_traceable"],
            prior_lo=jnp.asarray(self.min, dtype=self._dtype),
            prior_hi=jnp.asarray(self.max, dtype=self._dtype),
            n_effective=n_effective,
            n_active=n_active,
            n_prior=n_prior,
            sample=sample,
            n_max_steps=n_max_steps,
            n_total=n_total,
            n_evidence=n_evidence,
            seed=random_state,
            custom_prior=prior,
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
        }
        self.chain = chain_data["chain"]
        with open(self.mcmc_path, "wb") as f:
            pickle.dump(chain_data, f)
        return chain_data
