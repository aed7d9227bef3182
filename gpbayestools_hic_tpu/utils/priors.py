"""Traceable priors for the SMC sampler.

The reference builds its pocoMC prior from a list of frozen scipy
distributions (src/mcmc.py:784-789); custom user priors follow the same
pattern.  pocoMC evaluates ``prior.logpdf`` in numpy -- here the prior
density must enter jitted device programs, so :class:`ScipyPrior` converts
the common scipy frozen distributions into JAX-traceable log-densities and
exposes the ``log_prior_jax(x) -> (m,)`` / ``rvs(n)`` / ``dim`` / ``bounds``
interface :func:`..samplers.smc.run_smc` expects.

Supported 1-D marginals: ``uniform``, ``norm``, ``truncnorm``, ``loguniform``
(densities evaluated inside the sampling box; anything else raises with a
pointer to the ``log_prior_jax`` extension hook).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _logpdf_factory(dist):
    name = dist.dist.name
    args = dist.args
    kwds = dist.kwds
    # scipy frozen dists: shape/loc/scale may be positional or keyword
    def get(i, key, default):
        if key in kwds:
            return float(kwds[key])
        if len(args) > i:
            return float(args[i])
        return default

    if name == "uniform":
        loc, scale = get(0, "loc", 0.0), get(1, "scale", 1.0)

        def logpdf(x):
            inside = (x >= loc) & (x <= loc + scale)
            return jnp.where(inside, -jnp.log(scale), -jnp.inf)

        return logpdf
    if name == "norm":
        loc, scale = get(0, "loc", 0.0), get(1, "scale", 1.0)

        def logpdf(x):
            z = (x - loc) / scale
            return -0.5 * z**2 - jnp.log(scale) - 0.5 * jnp.log(2 * jnp.pi)

        return logpdf
    if name == "truncnorm":
        a, b = get(0, "a", None), get(1, "b", None)
        loc, scale = get(2, "loc", 0.0), get(3, "scale", 1.0)
        from scipy.stats import norm as _norm

        log_norm_const = float(np.log(_norm.cdf(b) - _norm.cdf(a)))

        def logpdf(x):
            z = (x - loc) / scale
            inside = (z >= a) & (z <= b)
            lp = (
                -0.5 * z**2 - jnp.log(scale) - 0.5 * jnp.log(2 * jnp.pi)
                - log_norm_const
            )
            return jnp.where(inside, lp, -jnp.inf)

        return logpdf
    if name in ("loguniform", "reciprocal"):
        a, b = get(0, "a", None), get(1, "b", None)
        loc, scale = get(2, "loc", 0.0), get(3, "scale", 1.0)
        log_range = float(np.log(np.log(b) - np.log(a)))

        def logpdf(x):
            # scipy shift/scale convention: X = loc + scale * base with
            # base ~ loguniform(a, b); density picks up a 1/scale factor
            z = (x - loc) / scale
            inside = (z >= a) & (z <= b)
            # clamp keeps log() finite outside the support so the masked
            # branch cannot leak NaN into gradients
            lp = -jnp.log(jnp.maximum(z, a)) - log_range - jnp.log(scale)
            return jnp.where(inside, lp, -jnp.inf)

        return logpdf
    raise ValueError(
        f"unsupported scipy distribution {name!r}; provide an object with a "
        "JAX-traceable log_prior_jax(x) instead"
    )


class ScipyPrior:
    """Independent per-dimension prior from frozen scipy distributions.

    Mirrors the ``pocomc.Prior(list_of_dists)`` construction the reference
    uses (src/mcmc.py:784-789) while staying JAX-traceable.
    """

    def __init__(self, dists):
        self.dists = list(dists)
        self.dim = len(self.dists)
        self._logpdfs = [_logpdf_factory(d) for d in self.dists]
        self.bounds = np.array([d.support() for d in self.dists])

    def log_prior_jax(self, x: jnp.ndarray) -> jnp.ndarray:
        """(m, dim) -> (m,) total log prior density (traceable)."""
        total = jnp.zeros(x.shape[0], dtype=x.dtype)
        for d, fn in enumerate(self._logpdfs):
            total = total + fn(x[:, d])
        return total

    def logpdf(self, x) -> np.ndarray:
        """numpy convenience (pocoMC-compatible)."""
        return np.asarray(self.log_prior_jax(jnp.atleast_2d(jnp.asarray(x))))

    def rvs(self, size: int, random_state=None) -> np.ndarray:
        """Draw ``size`` samples.  ``random_state`` (a numpy Generator)
        makes the draws seed-deterministic -- without it scipy falls back
        to the GLOBAL numpy state, which silently broke run-to-run
        reproducibility (and checkpoint-resume bit-equality) of SMC runs
        with custom priors (round-5 regression test)."""
        return np.stack(
            [d.rvs(size=size, random_state=random_state) for d in self.dists],
            axis=1,
        )
