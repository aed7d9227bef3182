"""GPBayesTools-HIC-TPU: TPU-native Bayesian-emulation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``Hendrik1704/GPBayesTools-HIC`` (reference: /root/reference/src/*), designed
TPU-first:

- PCA-projected multi-output Gaussian-process emulators whose Gram-matrix
  construction, Cholesky factorizations, and posterior predictions run as
  batched XLA/Pallas programs (reference: src/emulator.py, emulator_BAND.py).
- Bayesian calibration with three MCMC families -- affine-invariant ensemble,
  parallel-tempered Langevin, and flow-preconditioned SMC -- implemented as
  jitted ``lax.scan`` step kernels with walkers vmapped/sharded over a device
  mesh (reference: src/mcmc.py).
- Maximin/MaxPro Latin-hypercube experiment designs generated natively
  (reference: src/design.py uses an R subprocess; here it is pure JAX).

Layering (mirrors SURVEY.md section 7):
  ops/       -- L1 core numerics: kernels, linalg, scalers/PCA, L-BFGS-B
  models/    -- L3 emulators: batched GP, Emulator, EmulatorBAND (PCGP/PCSK)
  samplers/  -- L4 calibration: Chain, ensemble/PTLMC/SMC samplers, flows
  design/    -- L2 experiment design: maximin LHS
  parallel/  -- device-mesh sharding helpers
  utils/     -- IO contracts, metrics, clustering, sensitivity, plotting
"""

import jax as _jax

# On TPU, matmuls default to bf16 inputs with f32 accumulation.  For GP
# covariance algebra that is not a rounding nuisance but a correctness bug:
# products like B^T B pick up ~1e-2 relative error and assembled covariance
# matrices acquire negative eigenvalues (observed: eig -0.011 on a matrix of
# norm 46), turning valid likelihoods into -inf.  This is a numerics
# library, so full-precision matmuls are the only safe default; callers can
# override per-op with jax.lax.Precision or jax.default_matmul_precision.
_jax.config.update("jax_default_matmul_precision", "highest")

from .runtime import (  # noqa: F401
    workdir,
    cachedir,
    parse_model_parameter_file,
)

__version__ = "0.5.0"
