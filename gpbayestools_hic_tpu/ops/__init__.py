"""L1 core numerics: covariance kernels, linear algebra, scalers, optimizers.

Everything in this package is a pure function on JAX arrays: jit-, vmap-, and
shard_map-compatible.  These replace the external numeric engines the
reference delegates to (scipy LAPACK, sklearn PCA/StandardScaler/GPR kernels,
scipy.optimize L-BFGS-B).
"""

from .scalers import StandardScalerState, fit_standard_scaler, scaler_transform, scaler_inverse_transform  # noqa: F401
from .scalers import PCAState, fit_pca, pca_transform, pca_inverse_transform  # noqa: F401
from .kernels import kernel_fn, KernelConfig  # noqa: F401
from .linalg import mvn_loglike, mvn_loglike_batch, cholesky_jittered, solve_lower_triangular, spd_qform_logdet  # noqa: F401
from .lbfgsb import lbfgsb_minimize  # noqa: F401
