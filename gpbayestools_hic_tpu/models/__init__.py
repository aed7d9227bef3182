"""L3 emulation: batched exact GPs and the PCA-projected emulator heads.

- :mod:`.gp` -- from-scratch batched exact Gaussian-process regression
  (replaces sklearn ``GaussianProcessRegressor``).
- :mod:`.emulator` -- :class:`Emulator`, API-parity with the reference's
  sklearn-backed emulator (reference: src/emulator.py).
- :mod:`.emulator_band` -- :class:`EmulatorBAND` with PCGP / PCSK / PCGPwImpute
  heads (reference: src/emulator_BAND.py, surmise 0.2.1 semantics).
- :mod:`.param_pca` -- viscosity-curve parametrizations and the
  parameter-space PCA transform ("parameterTrafoPCA").
"""

from .gp import GPConfig, GPState, gp_fit, gp_predict, gp_nll  # noqa: F401
from .emulator import Emulator  # noqa: F401
from .emulator_band import EmulatorBAND  # noqa: F401
from .joint import train_emulators_jointly  # noqa: F401
from .migrate import from_reference  # noqa: F401
