"""Global numeric configuration for the TPU-native stack.

The reference stack runs float64 LAPACK everywhere (src/mcmc.py:23-65).
On TPU, f64 is emulated and slow, while f32 + jitter is accurate enough for
the well-conditioned covariances in this domain (GP Gram matrices carry an
``alpha=0.1`` diagonal; likelihood covariances carry experimental variances on
the diagonal).  The policy:

- ``working_dtype()``: f64 when JAX x64 mode is enabled (CPU parity tests),
  f32 otherwise (TPU fast path).
- Cholesky jitter scales with dtype.

Enable x64 for parity testing with ``jax.config.update('jax_enable_x64', True)``
before tracing, or ``JAX_ENABLE_X64=1`` in the environment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Multiplied onto the mean diagonal magnitude when a Cholesky needs rescuing.
CHOL_JITTER_F32 = 1e-6
CHOL_JITTER_F64 = 1e-12


def x64_enabled() -> bool:
    return bool(jax.config.read("jax_enable_x64"))


def working_dtype() -> jnp.dtype:
    """Default floating dtype: f64 under x64 mode, else f32."""
    return jnp.float64 if x64_enabled() else jnp.float32


def chol_jitter(dtype) -> float:
    return CHOL_JITTER_F64 if jnp.dtype(dtype) == jnp.float64 else CHOL_JITTER_F32


def default_device_kind() -> str:
    return jax.devices()[0].platform


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    The big one-time costs here are sampler/GP-fit compilations (~35 s for
    the flagship ``gp_fit`` program over the TPU tunnel); the persistent
    cache turns repeat runs into ~3 s loads.  Call before the first trace.
    """
    if path is None:
        from .runtime import cachedir

        path = str(cachedir / "jax_compilation")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
