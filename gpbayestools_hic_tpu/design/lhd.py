"""Maximin / MaxPro Latin-hypercube designs, natively in JAX.

The reference shells out to R for its designs (``MaxProLHD`` +
``MaxProRunOrder``; src/design.py:65-74, with the older ``lhs::maximinLHS``
call commented out at :52-63) and caches the result as
``cache/lhs/npoints{}_ndim{}_seed{}.npy`` (:42-49).  Here the generator is a
jitted simulated-annealing coordinate-exchange optimizer over the LHS
permutation structure:

- start from a random Latin hypercube (stratified per dimension);
- propose swapping one dimension's values between two random points (this
  preserves the Latin property exactly);
- improve either the **maximin** criterion (maximize the minimum pairwise
  distance; softmin objective, exact min tracked for reporting) or the
  **MaxPro** criterion (minimize ``sum_{i<j} 1 / prod_d (x_id - x_jd)^2``,
  computed in log space for stability);
- anneal the Metropolis temperature.

Differences from the reference, by design (SURVEY.md quirk list):

- the default seed is FIXED (the reference's own historical defaults,
  src/design.py:121) and logged -- not wall-clock time;
- no run-order column: ``Design.array`` is the design itself (the
  reference drops column 0 of the R output at src/design.py:138 because
  ``MaxProRunOrder`` prepends an index; nothing to drop here).
"""

from __future__ import annotations

import logging
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..runtime import cachedir, parse_model_parameter_file

logger = logging.getLogger(__name__)

#: The reference's historical fixed seeds (src/design.py:121, commented out
#: there in favor of wall-clock; fixed here for reproducibility).
DEFAULT_SEED_MAIN = 450829120
DEFAULT_SEED_VALIDATION = 751783496


def _random_lhs(key, npoints: int, ndim: int) -> jnp.ndarray:
    """Random Latin hypercube on [0, 1]^d: one stratum per point per dim."""
    key_perm, key_u = jax.random.split(key)
    perms = jax.vmap(
        lambda k: jax.random.permutation(k, npoints)
    )(jax.random.split(key_perm, ndim)).T  # (npoints, ndim)
    u = jax.random.uniform(key_u, (npoints, ndim))
    return (perms + u) / npoints


def _pairwise_logsq(x):
    """log((x_i - x_j)^2 + eps) summed over dims -> (n, n)."""
    diff = x[:, None, :] - x[None, :, :]
    return jnp.sum(jnp.log(diff**2 + 1e-20), axis=-1)


def _maxpro_energy(x):
    """log of the MaxPro criterion sum_{i<j} prod_d (x_id-x_jd)^-2."""
    s = _pairwise_logsq(x)
    n = x.shape[0]
    iu = jnp.triu_indices(n, k=1)
    return jax.scipy.special.logsumexp(-s[iu])


def _maximin_energy(x):
    """Negative softmin pairwise distance (to minimize)."""
    diff = x[:, None, :] - x[None, :, :]
    d2 = jnp.sum(diff**2, axis=-1)
    n = x.shape[0]
    iu = jnp.triu_indices(n, k=1)
    # softmin: -logsumexp(-beta d^2)/beta, smooth surrogate of min distance
    beta = 4.0 * n
    return jax.scipy.special.logsumexp(-beta * d2[iu])


@partial(jax.jit, static_argnames=("niters", "criterion"))
def _anneal(key, x0, *, niters: int, criterion: str):
    energy_fn = _maxpro_energy if criterion == "maxpro" else _maximin_energy
    n, d = x0.shape

    def step(carry, inp):
        x, e, best_x, best_e = carry
        key, temp = inp
        k1, k2, k3, k4 = jax.random.split(key, 4)
        i = jax.random.randint(k1, (), 0, n)
        # j != i by construction: an i == j draw would be a guaranteed-
        # accepted no-op swap wasting ~1/n of the annealing budget
        j = jnp.mod(i + 1 + jax.random.randint(k2, (), 0, n - 1), n)
        dim = jax.random.randint(k3, (), 0, d)
        xi, xj = x[i, dim], x[j, dim]
        x_new = x.at[i, dim].set(xj).at[j, dim].set(xi)
        e_new = energy_fn(x_new)
        accept = (e_new < e) | (
            jax.random.uniform(k4) < jnp.exp((e - e_new) / temp)
        )
        x = jnp.where(accept, x_new, x)
        e = jnp.where(accept, e_new, e)
        better = e < best_e
        best_x = jnp.where(better, x, best_x)
        best_e = jnp.where(better, e, best_e)
        return (x, e, best_x, best_e), None

    e0 = energy_fn(x0)
    keys = jax.random.split(key, niters)
    temps = 0.5 * jnp.exp(jnp.linspace(0.0, -8.0, niters))
    (x, e, best_x, best_e), _ = lax.scan(
        step, (x0, e0, x0, e0), (keys, temps)
    )
    return best_x, best_e


def generate_lhs(
    npoints: int,
    ndim: int,
    seed: int,
    *,
    method: str = "maxpro",
    niters: int | None = None,
    cache: bool = True,
) -> np.ndarray:
    """Generate an optimized LHS on [0, 1]^d; cached like the reference.

    ``method``: "maxpro" (reference default via R MaxPro) or "maximin".
    The cache key matches the reference layout
    (``cache/lhs/npoints{}_ndim{}_seed{}.npy``, src/design.py:42-49) with the
    method appended for non-default methods.
    """
    if method not in ("maxpro", "maximin"):
        # an unknown string would otherwise silently optimize maximin AND
        # persist the wrong design under the typo'd cache name
        raise ValueError(
            f"unknown LHS method {method!r}: use 'maxpro' or 'maximin'"
        )
    logger.debug(
        "generating %s LHS: npoints=%d ndim=%d seed=%d",
        method, npoints, ndim, seed,
    )
    default_niters = int(min(20000, 200 * npoints))
    suffix = "" if method == "maxpro" else f"_{method}"
    if niters is not None and niters != default_niters:
        suffix += f"_niters{niters}"
    cachefile = (
        Path(str(cachedir)) / "lhs" /
        f"npoints{npoints}_ndim{ndim}_seed{seed}{suffix}.npy"
    )
    if cache and cachefile.exists():
        logger.debug("loading from cache")
        return np.load(cachefile)

    if niters is None:
        niters = default_niters
    key = jax.random.PRNGKey(seed)
    k_init, k_anneal = jax.random.split(key)
    x0 = _random_lhs(k_init, npoints, ndim)
    x, energy = _anneal(k_anneal, x0, niters=niters, criterion=method)
    x = np.asarray(x)
    # the annealer optimizes a smooth surrogate (softmin / log-product);
    # report the EXACT criterion value users care about alongside it.
    # Gate on the log level: min_pairwise_distance materializes an
    # (n, n, d) temporary (~4 GB at n=5000, d=20) that must not be built
    # just to feed a discarded debug line.
    if logger.isEnabledFor(logging.DEBUG):
        logger.debug(
            "annealed %s surrogate energy: %.4f (exact min pairwise "
            "distance %.5f)", method, float(energy),
            min_pairwise_distance(x),
        )

    if cache:
        cachefile.parent.mkdir(parents=True, exist_ok=True)
        np.save(cachefile, x)
    return x


def min_pairwise_distance(x: np.ndarray) -> float:
    d2 = np.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    np.fill_diagonal(d2, np.inf)
    return float(np.sqrt(d2.min()))


class Design:
    """Latin-hypercube model design (reference: src/design.py:86-159).

    Public attributes match the reference: ``type`` ('main'/'validation'),
    ``pardict``, ``min``/``max``, ``ndim``, ``points`` (padded names),
    ``array``; converts implicitly to a numpy array.
    """

    def __init__(
        self,
        parfile,
        npoints: int = 500,
        validation: bool = False,
        seed: int | None = None,
        method: str = "maxpro",
    ):
        self.pardict = parse_model_parameter_file(parfile)
        self.type = "validation" if validation else "main"
        self.ndim = len(self.pardict)

        fmt = "parameter_{:0" + str(len(str(npoints - 1))) + "d}"
        self.points = [fmt.format(i) for i in range(npoints)]

        if seed is None:
            seed = DEFAULT_SEED_VALIDATION if validation else DEFAULT_SEED_MAIN
            logger.info("using default %s design seed = %d", self.type, seed)
        self.seed = seed

        self.min = np.array([v[1] for v in self.pardict.values()])
        self.max = np.array([v[2] for v in self.pardict.values()])

        unit = generate_lhs(npoints, self.ndim, seed, method=method)
        self.array = self.min + (self.max - self.min) * unit

    def __array__(self, dtype=None, copy=None):
        out = np.asarray(self.array, dtype=dtype)
        if copy:
            return out.copy()
        if copy is False and out is not self.array:
            # NumPy 2 protocol: copy=False must alias or raise, never
            # silently hand back a fresh array the caller can't mutate
            # through (the reference crashed on exactly this class of
            # numpy-2 semantics change)
            raise ValueError(
                "Design.__array__ cannot satisfy copy=False with a dtype "
                "conversion"
            )
        return out

    def write_files(self, basedir):
        """Write one ``key value`` input file per design point
        (reference: src/design.py:143-159)."""
        outdir = Path(basedir) / self.type
        outdir.mkdir(parents=True, exist_ok=True)
        for point, row in zip(self.points, self.array):
            filepath = outdir / point
            with filepath.open("w") as f:
                for key, value in zip(self.pardict.keys(), row):
                    f.write(f"{key} {value}\n")
            logger.debug("wrote %s", filepath)
