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

Host/device split: the FIT functions compute on the host in numpy/LAPACK
f64 and return numpy-backed states.  Fitting is one-time training prep --
on this runtime every eager device op pays a multi-second remote compile,
and TPU has no native SVD at all (XLA's iterative lowering is ~1000x slower
than LAPACK on the flagship blocks).  The TRANSFORM functions are written
with dtype-generic operators so they work both on host arrays (training
prep) and traced values (inside the fused jitted predict programs, where
the fitted state enters as a device pytree).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def _result_dtype(x) -> np.dtype:
    dt = np.dtype(getattr(x, "dtype", np.float64))
    # jnp.issubdtype (not np.issubdtype, and not dt.kind -- ml_dtypes
    # floats register as structured 'V' kinds under numpy) recognizes
    # bfloat16/float8 as floating, so a bf16 input keeps its dtype
    # instead of silently upcasting to float64 (ADVICE r4; the first fix
    # attempt used dt.kind == "f", which is ALSO False for bf16)
    if not jnp.issubdtype(dt, jnp.floating):
        # integer/bool inputs must upcast (sklearn semantics): casting a
        # fitted scale like 0.816 to int silently truncates to 0, and
        # scaler_transform then divides by zero
        return np.dtype(np.float64)
    return dt


class StandardScalerState(NamedTuple):
    mean: jnp.ndarray   # (nfeatures,)
    scale: jnp.ndarray  # (nfeatures,) biased std, zeros mapped to 1
    var: jnp.ndarray    # (nfeatures,) biased variance (sklearn's .var_)


def fit_standard_scaler(x) -> StandardScalerState:
    """Fit mean/std over axis 0 of ``x`` (nsamples, nfeatures); host-side."""
    dt = _result_dtype(x)
    xn = np.asarray(x, dtype=np.float64)
    mean = xn.mean(axis=0)
    var = xn.var(axis=0)
    scale = np.sqrt(var)
    scale = np.where(scale == 0.0, 1.0, scale)
    return StandardScalerState(
        mean=mean.astype(dt), scale=scale.astype(dt), var=var.astype(dt)
    )


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


def fit_pca(x, whiten: bool = True) -> PCAState:
    """Full-SVD PCA of ``x`` (nsamples, nfeatures); keeps all components.

    Variance-threshold truncation (sklearn's ``n_components=0.99``) is a
    *post-fit* index selection -- see :func:`n_components_for_variance` --
    so shapes stay static under jit.

    Host-side: LAPACK dgesdd in f64, the same engine sklearn's
    svd_solver='full' uses (see module docstring on the host/device split).
    """
    dt = _result_dtype(x)
    xn = np.asarray(x, dtype=np.float64)
    mean = xn.mean(axis=0)
    xc = xn - mean
    n = xn.shape[0]
    # full_matrices=False: U (n, k), s (k,), vt (k, nfeatures), k = min(n, nfeat)
    _, s, vt = np.linalg.svd(xc, full_matrices=False)
    # Deterministic sign: make the max-|.| coefficient of each component >= 0.
    max_idx = np.argmax(np.abs(vt), axis=1)
    signs = np.sign(vt[np.arange(vt.shape[0]), max_idx])
    signs = np.where(signs == 0.0, 1.0, signs)
    vt = vt * signs[:, None]
    explained_variance = (s**2) / (n - 1)
    ratio = explained_variance / explained_variance.sum()
    return PCAState(
        mean=mean.astype(dt),
        components=vt.astype(dt),
        explained_variance=explained_variance.astype(dt),
        explained_variance_ratio=ratio.astype(dt),
        whiten=whiten,
    )


def pca_transform(state: PCAState, x, npc: int | None = None):
    """Project ``x`` onto the first ``npc`` components (all if None).

    Operator-generic: host numpy in, host numpy out; traced in, traced out.
    """
    comps = state.components if npc is None else state.components[:npc]
    z = (x - state.mean) @ comps.T
    if state.whiten:
        ev = state.explained_variance if npc is None else state.explained_variance[:npc]
        z = z / ev**0.5
    return z


def pca_inverse_transform(state: PCAState, z):
    """Map scores back to feature space (uses first z.shape[-1] components)."""
    npc = z.shape[-1]
    comps = state.components[:npc]
    if state.whiten:
        z = z * state.explained_variance[:npc] ** 0.5
    return z @ comps + state.mean


def n_components_for_variance(state: PCAState, target: float) -> int:
    """Smallest k with cumulative explained-variance ratio > target.

    Mirrors sklearn's ``PCA(n_components=0.99)`` selection rule
    (searchsorted on the cumulative ratio, side='right', then +1).
    Host-side helper (returns a Python int; call outside jit).
    """
    csum = np.cumsum(np.asarray(state.explained_variance_ratio))
    k = int(np.searchsorted(csum, target, side="right")) + 1
    return min(k, int(state.components.shape[0]))
