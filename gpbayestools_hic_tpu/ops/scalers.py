"""Standardization and PCA as pure-function pytree transforms.

From-scratch replacements for the sklearn ``StandardScaler`` and
``PCA(whiten=True, svd_solver='full')`` pieces the reference composes inside
its emulators (reference: src/emulator.py:76-77, 257-274, 330-363).  Both are
implemented as (fit -> state pytree, apply -> pure function) pairs so the
whole preprocess -> GP -> inverse-transform chain stays inside one jitted
device program.

Conventions match sklearn numerically:

- ``StandardScaler``: mean over axis 0, *biased* std (ddof=0); zero-variance
  columns get scale 1 so the transform is a no-op on them.
- ``PCA``: center, full SVD, ``components_ = Vt``, ``explained_variance_ =
  S^2/(n-1)``; whitened scores are ``X_c @ Vt.T / sqrt(explained_variance)``.
  A deterministic sign convention (largest-|coefficient| entry of each
  component is positive) is applied; signs cancel in any round-trip so parity
  with sklearn holds at the prediction level.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class StandardScalerState(NamedTuple):
    mean: jnp.ndarray   # (nfeatures,)
    scale: jnp.ndarray  # (nfeatures,) biased std, zeros mapped to 1
    var: jnp.ndarray    # (nfeatures,) biased variance (sklearn's .var_)


def fit_standard_scaler(x: jnp.ndarray) -> StandardScalerState:
    """Fit mean/std over axis 0 of ``x`` (nsamples, nfeatures)."""
    mean = jnp.mean(x, axis=0)
    var = jnp.var(x, axis=0)
    scale = jnp.sqrt(var)
    scale = jnp.where(scale == 0.0, 1.0, scale)
    return StandardScalerState(mean=mean, scale=scale, var=var)


def scaler_transform(state: StandardScalerState, x: jnp.ndarray) -> jnp.ndarray:
    return (x - state.mean) / state.scale


def scaler_inverse_transform(state: StandardScalerState, z: jnp.ndarray) -> jnp.ndarray:
    return z * state.scale + state.mean


class PCAState(NamedTuple):
    mean: jnp.ndarray                # (nfeatures,)
    components: jnp.ndarray          # (ncomponents, nfeatures) = rows of Vt
    explained_variance: jnp.ndarray  # (ncomponents,) = S^2/(n-1)
    explained_variance_ratio: jnp.ndarray  # (ncomponents,)
    whiten: bool


def fit_pca(x: jnp.ndarray, whiten: bool = True) -> PCAState:
    """Full-SVD PCA of ``x`` (nsamples, nfeatures); keeps all components.

    Variance-threshold truncation (sklearn's ``n_components=0.99``) is a
    *post-fit* index selection -- see :func:`n_components_for_variance` --
    so shapes stay static under jit.
    """
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    n = x.shape[0]
    # full_matrices=False: U (n, k), s (k,), vt (k, nfeatures), k = min(n, nfeat)
    u, s, vt = jnp.linalg.svd(xc, full_matrices=False)
    # Deterministic sign: make the max-|.| coefficient of each component >= 0.
    max_idx = jnp.argmax(jnp.abs(vt), axis=1)
    signs = jnp.sign(vt[jnp.arange(vt.shape[0]), max_idx])
    signs = jnp.where(signs == 0.0, 1.0, signs)
    vt = vt * signs[:, None]
    explained_variance = (s**2) / (n - 1)
    total_var = jnp.sum(explained_variance)
    ratio = explained_variance / total_var
    return PCAState(
        mean=mean,
        components=vt,
        explained_variance=explained_variance,
        explained_variance_ratio=ratio,
        whiten=whiten,
    )


def pca_transform(state: PCAState, x: jnp.ndarray, npc: int | None = None) -> jnp.ndarray:
    """Project ``x`` onto the first ``npc`` components (all if None)."""
    comps = state.components if npc is None else state.components[:npc]
    z = (x - state.mean) @ comps.T
    if state.whiten:
        ev = state.explained_variance if npc is None else state.explained_variance[:npc]
        z = z / jnp.sqrt(ev)
    return z


def pca_inverse_transform(state: PCAState, z: jnp.ndarray) -> jnp.ndarray:
    """Map scores back to feature space (uses first z.shape[-1] components)."""
    npc = z.shape[-1]
    comps = state.components[:npc]
    if state.whiten:
        z = z * jnp.sqrt(state.explained_variance[:npc])
    return z @ comps + state.mean


def n_components_for_variance(state: PCAState, target: float) -> int:
    """Smallest k with cumulative explained-variance ratio > target.

    Mirrors sklearn's ``PCA(n_components=0.99)`` selection rule
    (searchsorted on the cumulative ratio, side='right', then +1).
    Host-side helper (returns a Python int; call outside jit).
    """
    csum = jnp.cumsum(state.explained_variance_ratio)
    k = int(jnp.searchsorted(csum, target, side="right")) + 1
    return min(k, int(state.components.shape[0]))
