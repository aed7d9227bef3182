"""L4 calibration and sampling.

- :mod:`.chain` -- :class:`Chain`: device-resident experimental data +
  emulator ensemble, one jitted ``log_posterior`` (reference: src/mcmc.py).
- :mod:`.ensemble` -- affine-invariant stretch-move ensemble sampler
  (emcee semantics) as a jitted ``lax.scan``.
- :mod:`.ptlmc` -- parallel-tempered Langevin Monte Carlo (surmise PTLMC
  semantics).
- :mod:`.smc` -- flow-preconditioned sequential Monte Carlo (pocoMC
  semantics).
- :mod:`.flows` -- normalizing flows used by the SMC preconditioner.
- :mod:`.hmc` -- preconditioned Hamiltonian MC over the differentiable
  posterior (beyond-reference; impossible on the reference's numpy path).
"""

from .chain import Chain  # noqa: F401
from .ensemble import run_ensemble, EnsembleResult  # noqa: F401
from .hmc import run_hmc, HMCResult  # noqa: F401
