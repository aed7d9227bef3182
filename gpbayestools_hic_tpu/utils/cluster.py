"""Posterior cluster sampling: chain sorting + from-scratch k-means.

Rebuild of ``examples/generate_posterior_clusters.py`` (reference :7-93),
which the BASELINE names as required for parity:

- :func:`sort_chain_likelihood` -- sort an SMC chain by log-likelihood
  descending and write ``*_sorted.pkl`` (reference :24-56);
- :func:`kmeans` -- Lloyd's algorithm with k-means++ seeding, ``n_init``
  independent starts run as one vmapped batch (replaces
  ``sklearn.KMeans(n_clusters, n_init=10, random_state=42)``,
  reference :58-76);
- :func:`generate_posterior_clusters` -- standardize the top-N samples,
  cluster, and write ``cluster_centers.txt`` with one cluster per COLUMN
  (the reference writes the transposed centers, :76).
"""

from __future__ import annotations

import logging
import pickle
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

logger = logging.getLogger(__name__)


def _kmeans_pp_init(key, x, k):
    """k-means++ seeding."""
    n = x.shape[0]
    key0, key_rest = jax.random.split(key)
    first = jax.random.randint(key0, (), 0, n)
    centers0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])

    def body(i, carry):
        centers, key = carry
        key, sub = jax.random.split(key)
        d2 = jnp.min(
            jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
            + jnp.where(jnp.arange(k) >= i, jnp.inf, 0.0)[None, :],
            axis=1,
        )
        # all-duplicate inputs give d2 == 0 everywhere; 0/0 probabilities
        # would feed NaN into jax.random.choice silently under jit -- fall
        # back to a uniform draw (sklearn's _kmeans_plusplus does the same)
        total = jnp.sum(d2)
        probs = jnp.where(total > 0, d2 / jnp.where(total > 0, total, 1.0),
                          jnp.full((n,), 1.0 / n, x.dtype))
        idx = jax.random.choice(sub, n, p=probs)
        return centers.at[i].set(x[idx]), key

    centers, _ = lax.fori_loop(1, k, body, (centers0, key_rest))
    return centers


@partial(jax.jit, static_argnames=("k", "n_init", "max_iter"))
def kmeans(
    x: jnp.ndarray,
    k: int,
    *,
    key: jax.Array,
    n_init: int = 10,
    max_iter: int = 300,
    tol: float = 1e-6,
):
    """K-means clustering; returns (centers (k, d), labels (n,), inertia).

    ``n_init`` independent k-means++ starts run as one vmapped batch of
    Lloyd iterations; the lowest-inertia run wins (sklearn semantics).
    """
    n, d = x.shape
    if n < k:
        # sklearn raises the same way; silently returning duplicated /
        # zero-initialized centers would poison cluster_centers.txt
        raise ValueError(f"n_samples={n} should be >= n_clusters={k}")

    def lloyd(key):
        centers = _kmeans_pp_init(key, x, k)

        def step(state):
            centers, _, it, _ = state
            d2 = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
            labels = jnp.argmin(d2, axis=1)
            onehot = jax.nn.one_hot(labels, k, dtype=x.dtype)
            counts = jnp.sum(onehot, axis=0)
            sums = onehot.T @ x
            new_centers = jnp.where(
                counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1),
                centers,
            )
            shift = jnp.max(jnp.sum((new_centers - centers) ** 2, axis=1))
            return new_centers, labels, it + 1, shift

        def cond(state):
            _, _, it, shift = state
            return (it < max_iter) & (shift > tol)

        init = step((centers, jnp.zeros(n, jnp.int32), jnp.asarray(0), jnp.inf))
        centers, labels, *_ = lax.while_loop(cond, lambda s: step(s), init)
        d2 = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        labels = jnp.argmin(d2, axis=1)
        inertia = jnp.sum(jnp.min(d2, axis=1))
        return centers, labels, inertia

    keys = jax.random.split(key, n_init)
    centers_all, labels_all, inertia_all = jax.vmap(lloyd)(keys)
    best = jnp.argmin(inertia_all)
    return centers_all[best], labels_all[best], inertia_all[best]


def sort_chain_likelihood(chain_path, output_path=None):
    """Sort an SMC chain pickle by log-likelihood descending; write
    ``*_sorted.pkl`` (reference: generate_posterior_clusters.py:24-56)."""
    chain_path = Path(chain_path)
    with open(chain_path, "rb") as f:
        data = pickle.load(f)
    order = np.argsort(-np.asarray(data["logl"]))
    sorted_data = dict(data)
    for k in ("chain", "weights", "logl", "logp"):
        if k in sorted_data:
            sorted_data[k] = np.asarray(sorted_data[k])[order]
    if output_path is None:
        output_path = chain_path.with_name(chain_path.stem + "_sorted.pkl")
    with open(output_path, "wb") as f:
        pickle.dump(sorted_data, f)
    logger.info("wrote sorted chain to %s", output_path)
    return sorted_data


def generate_posterior_clusters(
    chain_path,
    n_clusters: int,
    n_top_samples: int = 1000,
    output_dir=None,
    random_state: int = 42,
    n_init: int = 10,
):
    """Cluster the top-likelihood posterior samples; write cluster centers.

    Mirrors the reference workflow (generate_posterior_clusters.py:58-93):
    sort by logl, take the top ``n_top_samples``, standardize, k-means,
    un-standardize the centers, and write ``cluster_centers.txt`` with one
    cluster per column (the reference's transposed layout).
    Returns (centers (n_clusters, ndim), labels).
    """
    sorted_data = sort_chain_likelihood(chain_path)
    top = np.asarray(sorted_data["chain"])[:n_top_samples]
    mean = top.mean(axis=0)
    scale = top.std(axis=0)
    scale[scale == 0] = 1.0

    # pin this one-off tiny job to the local CPU backend: on the default
    # device (a remote TPU tunnel here) the kmeans jit + eager transfers
    # pay a multi-second remote compile for sub-second host work -- the
    # same policy as models/param_pca.fit_param_pca
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    import contextlib

    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        z = jnp.asarray((top - mean) / scale)
        centers_std, labels, inertia = kmeans(
            z, n_clusters, key=jax.random.PRNGKey(random_state),
            n_init=n_init,
        )
    centers = np.asarray(centers_std) * scale + mean
    logger.info("k-means inertia: %.4f", float(inertia))
    used = np.unique(np.asarray(labels)).size
    if used < n_clusters:
        # heavily duplicated top samples (e.g. a sharply converged SMC
        # posterior) can leave clusters empty -- their centers are then
        # duplicates, and downstream consumers of cluster_centers.txt
        # should know the effective cluster count is lower
        logger.warning(
            "only %d of %d clusters are populated (top samples contain "
            "many duplicates); cluster_centers.txt has duplicate rows",
            used, n_clusters,
        )

    outdir = Path(output_dir) if output_dir else Path(chain_path).parent
    outdir.mkdir(parents=True, exist_ok=True)
    np.savetxt(outdir / "cluster_centers.txt", centers.T)
    return centers, np.asarray(labels)
