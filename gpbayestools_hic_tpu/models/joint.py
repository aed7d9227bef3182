"""Joint multi-emulator GP training: one batched fit for a whole ensemble.

The flagship calibration trains ~9 emulators over the SAME experiment design
(one per observable group; reference: RunBayesianAnalysis.ipynb cell 2,
EmulatorTraining.ipynb cell 5 trains them in a Python loop).  Since
:func:`..models.gp.gp_fit` already vmaps over its GP batch axis, the
ensembles' GPs can be stacked into ONE device program: 9 emulators x 4 PCs
= 36 GPs optimized simultaneously instead of 9 sequential dispatches.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .emulator import Emulator
from .gp import GPState, gp_fit

logger = logging.getLogger(__name__)


def train_emulators_jointly(
    emulators: Sequence[Emulator],
    event_mask=None,
    kernel_type: str | None = None,
):
    """Train all ``emulators`` in one batched GP fit.

    Requirements (checked): identical (possibly parameter-PCA-transformed)
    design matrices, identical parameter ranges, identical GP settings
    (alpha, maxiter, nrestarts, seed, kernel kind, MAP strength).  Each
    emulator ends up exactly as if ``trainEmulator`` had been called on it
    individually -- the GPs are independent, so batching changes nothing
    but the wall clock.  ``kernel_type=None`` uses the emulators' own
    configured kind (``EmulatorBAND.kernel_kind_``; "RBF" for the plain
    sklearn head, matching its ``trainEmulator`` default).
    """
    if not emulators:
        return
    if event_mask is None:
        event_mask = np.ones(emulators[0].nev, dtype=bool)
    if kernel_type is None:
        kernel_type = getattr(emulators[0], "kernel_kind_", "RBF")

    designs, zts, ptps, noise_diags, npcs = [], [], [], [], []
    for e in emulators:
        design, z_t, ptp, noise_diag = e._prepare_training(
            event_mask, kernel_type
        )
        designs.append(design)
        zts.append(z_t)
        ptps.append(ptp)
        if noise_diag is None:
            noise_diag = jnp.zeros_like(z_t)
        noise_diags.append(noise_diag)
        npcs.append(z_t.shape[0])

    base = emulators[0]
    for i, e in enumerate(emulators[1:], start=1):
        if designs[i].shape != designs[0].shape or not np.allclose(
            np.asarray(designs[i]), np.asarray(designs[0])
        ):
            raise ValueError(
                f"emulator {i} has a different design matrix; joint training "
                "requires a shared experiment design"
            )
        if not np.allclose(np.asarray(ptps[i]), np.asarray(ptps[0])):
            raise ValueError(f"emulator {i} has different parameter ranges")
        for attr in ("gp_alpha", "gp_maxiter", "nrestarts", "seed"):
            if getattr(e, attr) != getattr(base, attr):
                raise ValueError(
                    f"emulator {i} differs in {attr}; joint training requires "
                    "identical GP settings"
                )
        for attr in ("kernel_kind_", "gp_map_prior_strength"):
            if getattr(e, attr, None) != getattr(base, attr, None):
                raise ValueError(
                    f"emulator {i} differs in {attr}; joint training requires "
                    "identical GP settings"
                )

    z_all = jnp.concatenate(zts, axis=0)          # (sum npc, nev)
    noise_all = jnp.concatenate(noise_diags, axis=0)
    logger.info(
        "Jointly training %d GPs across %d emulators (%d points) ...",
        z_all.shape[0], len(emulators), designs[0].shape[0],
    )
    state_all: GPState = gp_fit(
        designs[0],
        z_all,
        ptps[0],
        config=base.gp_config,
        nrestarts=base.nrestarts,
        key=jax.random.PRNGKey(base.seed),
        maxiter=base.gp_maxiter,
        noise_diag=noise_all,
    )
    logger.info("joint GP LMLs: %s", np.asarray(state_all.lml))

    offsets = tuple(int(o) for o in np.cumsum([0] + npcs))
    for e, sliced in zip(emulators, _slice_states(offsets, state_all)):
        e._finalize_training(sliced)
    return emulators


@partial(jax.jit, static_argnums=(0,))
def _slice_states(offsets: tuple, sa: GPState):
    """Slice the joint GPState into per-emulator views in ONE program.

    Eager slicing would be 8 leaves x 9 emulators = 72 separate device
    dispatches (~25 ms each on this runtime's tunnel), i.e. ~2 s of pure
    dispatch latency on the training critical path.  Module-level + static
    offsets so the compiled program is REUSED across retrains (a jit
    defined inside the caller would be a fresh function object -- and a
    fresh compile -- every call)."""
    return tuple(
        GPState(
            params=jax.tree.map(lambda a: a[i0:i1], sa.params),
            x=sa.x,
            y=sa.y[i0:i1],
            chol=sa.chol[i0:i1],
            alpha_vec=sa.alpha_vec[i0:i1],
            linv=sa.linv[i0:i1],
            lml=sa.lml[i0:i1],
        )
        for i0, i1 in zip(offsets[:-1], offsets[1:])
    )
