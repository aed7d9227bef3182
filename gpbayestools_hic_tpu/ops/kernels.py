"""GP covariance kernels, built MXU-first.

Replaces the sklearn kernel objects the reference uses
(``1.0 * RBF(ls) + WhiteKernel`` and ``1.0 * Matern(nu=1.5) + WhiteKernel``,
reference: src/emulator.py:284-306) with pure functions over a hyperparameter
pytree ``{"log_amp", "log_ls", "log_noise"}`` (all in log space, matching
sklearn's internal ``theta`` parametrization so bounds/restart semantics
carry over).

TPU-first construction: the anisotropic squared distance is expanded as
``|u|^2 + |v|^2 - 2 u.v`` so the O(n^2 d) work is one matmul on the MXU and
the kernel evaluation itself is a fused VPU elementwise epilogue.  XLA fuses
the epilogue into the matmul consumer; no hand-written Pallas is needed for
the Gram matrix until n*d gets extreme.

Numerics match sklearn:
- RBF:        k = exp(-0.5 * sum((x-y)^2 / l^2))
- Matern 1.5: k = (1 + sqrt(3) d) exp(-sqrt(3) d),  d = sqrt(sum((x-y)^2/l^2))
- amplitude multiplies; white noise adds to the *self* Gram diagonal only
  (sklearn WhiteKernel returns 0 for cross-covariance blocks).

Additionally, "MaternProd" is the SEPARABLE product-Matern family used by
surmise 0.2.1's PCGP covariance (``emulation.methods.PCGP.__covmat``; the
Higdon et al. 2008 PCA-GP construction uses the same product form):

- MaternProd: k = prod_j (1 + d_j) exp(-d_j),  d_j = |x_j - y_j| / l_j

i.e. a product of 1-D Matern-3/2 correlations per input dimension (no
sqrt(3) factor -- surmise folds it into the lengthscale), which is NOT the
isotropic ARD Matern: the product form is smoother along axis-aligned
directions and matches surmise's per-dimension factorization.  Offered so
the kernel-family divergence documented in docs/SURMISE_PARITY.md items 5-6
is a measurable CHOICE rather than a fixed difference.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class KernelConfig(NamedTuple):
    """Static kernel configuration (hashable; safe as a jit static arg)."""

    kind: str = "RBF"  # "RBF" | "Matern" (nu = 1.5)


def _scaled_sqdist(xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared distance of pre-scaled inputs via one MXU matmul."""
    xn = jnp.sum(xs * xs, axis=-1)
    yn = jnp.sum(ys * ys, axis=-1)
    cross = xs @ ys.T
    d2 = xn[:, None] + yn[None, :] - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def kernel_fn(
    params: dict,
    x: jnp.ndarray,
    y: jnp.ndarray | None = None,
    *,
    config: KernelConfig = KernelConfig(),
    include_noise: bool = True,
) -> jnp.ndarray:
    """Gram matrix k(x, y) with hyperparameters ``params``.

    ``x`` (n, d), ``y`` (m, d) or None for the symmetric self-Gram.  White
    noise is added only on the self-Gram diagonal and only when
    ``include_noise`` is True.
    """
    amp = jnp.exp(params["log_amp"])
    ls = jnp.exp(params["log_ls"])
    xs = x / ls
    symmetric = y is None
    ys = xs if symmetric else y / ls
    if config.kind == "MaternProd":
        # separable product-Matern (surmise PCGP family): accumulate
        # log k = sum_j [log(1 + d_j) - d_j] one dimension at a time --
        # O(n m) working memory instead of an (n, m, d) broadcast, and the
        # per-dimension |.| stays a cheap VPU epilogue
        logk = jnp.zeros((xs.shape[0], ys.shape[0]), dtype=x.dtype)
        for j in range(xs.shape[1]):
            dj = jnp.abs(xs[:, j][:, None] - ys[:, j][None, :])
            logk = logk + jnp.log1p(dj) - dj
        k = amp * jnp.exp(logk)
    else:
        d2 = _scaled_sqdist(xs, ys)
        if config.kind == "RBF":
            k = amp * jnp.exp(-0.5 * d2)
        elif config.kind == "Matern":
            d = jnp.sqrt(d2 + 1e-32)
            sq3d = jnp.sqrt(3.0) * d
            k = amp * (1.0 + sq3d) * jnp.exp(-sq3d)
        else:
            raise ValueError(f"Unknown kernel kind: {config.kind}")
    if symmetric and include_noise:
        noise = jnp.exp(params["log_noise"])
        k = k + noise * jnp.eye(x.shape[0], dtype=k.dtype)
    return k


def kernel_diag(
    params: dict,
    x: jnp.ndarray,
    *,
    config: KernelConfig = KernelConfig(),
    include_noise: bool = True,
) -> jnp.ndarray:
    """Diagonal of the self-Gram k(x, x) without forming the matrix."""
    amp = jnp.exp(params["log_amp"])
    diag = jnp.full((x.shape[0],), amp, dtype=x.dtype)
    if include_noise:
        diag = diag + jnp.exp(params["log_noise"])
    return diag


def init_kernel_params(
    ptp: jnp.ndarray,
    *,
    amp: float = 1.0,
    noise: float = 0.05,
    dtype=None,
) -> dict:
    """Reference-default initialization: length scales = parameter ranges
    (src/emulator.py:286-306), amplitude 1, white-noise level 0.05."""
    ptp = jnp.asarray(ptp, dtype=dtype)
    return {
        "log_amp": jnp.asarray(jnp.log(amp), dtype=ptp.dtype),
        "log_ls": jnp.log(ptp),
        "log_noise": jnp.asarray(jnp.log(noise), dtype=ptp.dtype),
    }


def default_bounds(
    ptp: jnp.ndarray,
    *,
    kind: str = "RBF",
    dtype=None,
) -> tuple[dict, dict]:
    """Log-space hyperparameter bounds matching the reference kernels.

    RBF:    length-scale bounds ``outer(ptp, (1e-1, 1e2))``
    Matern: length-scale bounds ``outer(ptp, (1e-3, 1e5))``
    (MaternProd uses the Matern bounds)
    amplitude (sklearn ConstantKernel default): (1e-5, 1e5)
    white noise: (1e-2, 1e2)
    (reference: src/emulator.py:286-306)
    """
    ptp = jnp.asarray(ptp, dtype=dtype)
    ls_lo, ls_hi = (1e-1, 1e2) if kind == "RBF" else (1e-3, 1e5)
    lower = {
        "log_amp": jnp.asarray(jnp.log(1e-5), dtype=ptp.dtype),
        "log_ls": jnp.log(ptp * ls_lo),
        "log_noise": jnp.asarray(jnp.log(1e-2), dtype=ptp.dtype),
    }
    upper = {
        "log_amp": jnp.asarray(jnp.log(1e5), dtype=ptp.dtype),
        "log_ls": jnp.log(ptp * ls_hi),
        "log_noise": jnp.asarray(jnp.log(1e2), dtype=ptp.dtype),
    }
    return lower, upper
