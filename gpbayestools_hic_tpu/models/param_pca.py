"""Viscosity-curve parametrizations and parameter-space PCA ("parameterTrafoPCA").

The reference replaces physics-parameter subsets with principal components of
the *function curves* they induce, evaluated on fixed grids
(reference: src/emulator.py:79-241, mirrored in src/emulator_BAND.py:48-250).
Here the curve evaluations are vectorized ``jnp.where`` expressions (the
reference's notebook cells PlotMCMC.ipynb 37/39/41 already use this vector
form), and the whole curve-eval -> standardize -> project -> splice chain is
one jitted transform applied identically at train and predict time.

Exact reference quirks preserved (they change curve values on the grids):

- eta/s(mu_B): the ``0 < mu_B`` strict inequality means the mu_B = 0 grid
  point falls through to the ``eta_4`` branch (src/emulator.py:111-117).
- y_loss(y_init): y_init = 0 falls through to the third branch, giving
  ``yloss_4 - 2 (yloss_6 - yloss_4)`` (src/emulator.py:120-126).
- zeta/s(T): the branch condition is ``T < T_zeta0`` (the mu_B = 0 peak), not
  the shifted peak (src/emulator.py:102-108).

Group order matters: each group deletes its column indices from the *current*
design matrix and appends its PCs at the end (src/emulator.py:156-157,
194-195, 232-233).  That is only consistent when groups are processed in
descending index order (every later group's indices sit below all earlier
deletions); :func:`fit_param_pca` validates this.
"""

from __future__ import annotations

import logging
from typing import Callable, NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops.scalers import (
    fit_pca,
    fit_standard_scaler,
    n_components_for_variance,
    pca_transform,
    scaler_transform,
)

logger = logging.getLogger(__name__)


def zeta_over_s_vs_T(params: jnp.ndarray, T: jnp.ndarray, mu_B: float = 0.0) -> jnp.ndarray:
    """Asymmetric-Gaussian bulk viscosity zeta/s(T).

    ``params`` (..., 4) = (zeta_max, T_zeta0, sigma_plus, sigma_minus);
    broadcasts against grid ``T`` (g,).  Reference: src/emulator.py:102-108.
    """
    zeta_max = params[..., 0:1]
    T_zeta0 = params[..., 1:2]
    sigma_plus = params[..., 2:3]
    sigma_minus = params[..., 3:4]
    T_peak = T_zeta0 - 0.15 * mu_B**2
    d2 = (T - T_peak) ** 2
    left = jnp.exp(-d2 / (2.0 * sigma_minus**2))
    right = jnp.exp(-d2 / (2.0 * sigma_plus**2))
    return zeta_max * jnp.where(T < T_zeta0, left, right)


def eta_over_s_vs_mu_B(params: jnp.ndarray, mu_B: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-linear shear viscosity eta/s(mu_B).

    ``params`` (..., 3) = (eta_0, eta_2, eta_4).  Strict ``0 < mu_B`` bound
    kept from the reference (src/emulator.py:111-117): mu_B = 0 -> eta_4.
    """
    eta_0 = params[..., 0:1]
    eta_2 = params[..., 1:2]
    eta_4 = params[..., 2:3]
    seg1 = eta_0 + (eta_2 - eta_0) * (mu_B / 0.2)
    seg2 = eta_2 + (eta_4 - eta_2) * ((mu_B - 0.2) / 0.2)
    return jnp.where(
        (0.0 < mu_B) & (mu_B <= 0.2),
        seg1,
        jnp.where((0.2 < mu_B) & (mu_B < 0.4), seg2, eta_4),
    )


def y_loss_vs_y_init(params: jnp.ndarray, y_init: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-linear rapidity loss <y_loss>(y_init).

    ``params`` (..., 3) = (yloss_2, yloss_4, yloss_6).  Strict bounds kept
    from the reference (src/emulator.py:120-126): y_init = 0 falls through to
    the third branch.
    """
    y2 = params[..., 0:1]
    y4 = params[..., 1:2]
    y6 = params[..., 2:3]
    seg1 = y2 * (y_init / 2.0)
    seg2 = y2 + (y4 - y2) * ((y_init - 2.0) / 2.0)
    seg3 = y4 + (y6 - y4) * ((y_init - 4.0) / 2.0)
    return jnp.where(
        (0.0 < y_init) & (y_init <= 2.0),
        seg1,
        jnp.where((2.0 < y_init) & (y_init < 4.0), seg2, seg3),
    )


_CURVES: dict[str, Callable] = {
    "zeta": zeta_over_s_vs_T,
    "eta": eta_over_s_vs_mu_B,
    "yloss": y_loss_vs_y_init,
}


class ParamPCAGroup(NamedTuple):
    """Declarative config for one parameter-PCA group.

    The reference hardcodes these (src/emulator.py:86, 92, 98 and grid ranges
    at :132, :171, :209); here they are data.
    """

    name: str
    indices: tuple          # ORIGINAL design-column indices to replace
    grid: tuple             # curve evaluation grid (as a tuple for hashing)
    curve: str              # key into _CURVES


def default_groups() -> list[ParamPCAGroup]:
    """The reference's flagship 20-parameter configuration."""
    return [
        ParamPCAGroup(
            name="bulk",
            indices=(15, 16, 17, 18),
            grid=tuple(np.linspace(0.0, 0.5, 100)),
            curve="zeta",
        ),
        ParamPCAGroup(
            name="shear",
            indices=(12, 13, 14),
            grid=tuple(np.linspace(0.0, 0.6, 100)),
            curve="eta",
        ),
        ParamPCAGroup(
            name="yloss",
            indices=(2, 3, 4),
            grid=tuple(np.linspace(0.0, 6.2, 100)),
            curve="yloss",
        ),
    ]


class ParamPCAState(NamedTuple):
    """Fitted parameter-PCA transform (a pytree; group metadata is static)."""

    scalers: tuple          # one StandardScalerState per group
    pcas: tuple             # one PCAState per group
    npcs: tuple             # static ints: PCs kept per group (99% variance)


def _eval_group_curves(group: ParamPCAGroup, x: jnp.ndarray) -> jnp.ndarray:
    grid = jnp.asarray(group.grid, dtype=x.dtype)
    params = x[:, jnp.asarray(group.indices)]
    return _CURVES[group.curve](params, grid)


def _validate_group_order(groups: Sequence[ParamPCAGroup]) -> None:
    seen_min = np.inf
    for g in groups:
        if max(g.indices) >= seen_min:
            raise ValueError(
                "parameter-PCA groups must be ordered by descending column "
                f"index (group '{g.name}' indices {g.indices} overlap or sit "
                "above an earlier group's); the sequential delete-and-append "
                "splice is only index-consistent in that order"
            )
        seen_min = min(g.indices)


def fit_param_pca(
    design_points: np.ndarray,
    design_min: np.ndarray,
    design_max: np.ndarray,
    groups: Sequence[ParamPCAGroup] | None = None,
    *,
    target_variance: float = 0.99,
):
    """Fit the sequential group PCAs on the training design.

    Returns ``(state, new_design, new_min, new_max)`` where ``new_design`` has
    each group's columns replaced by its principal components (appended at the
    end, reference splice semantics) and min/max updated to the PC ranges
    (src/emulator.py:156-165).
    """
    if groups is None:
        groups = default_groups()
    _validate_group_order(groups)

    # Training-prep rule (CLAUDE.md): fit-time work must not run eager ops
    # on the default accelerator -- each would pay a remote compile on
    # runtimes like the axon tunnel.  The curve evaluators are shared with
    # the jitted predict path (single source of truth), so instead of
    # numpy twins the whole fit is pinned to the local CPU backend, where
    # eager compiles are milliseconds.
    import jax

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:  # no CPU backend registered: run on the default
        return _fit_param_pca_impl(
            design_points, design_min, design_max, groups, target_variance
        )
    with jax.default_device(cpu):
        return _fit_param_pca_impl(
            design_points, design_min, design_max, groups, target_variance
        )


def _fit_param_pca_impl(
    design_points, design_min, design_max, groups, target_variance
):
    x = jnp.asarray(design_points)
    scalers, pcas, npcs = [], [], []
    current = x
    new_min = np.asarray(design_min, dtype=float)
    new_max = np.asarray(design_max, dtype=float)
    for group in groups:
        curves = _eval_group_curves(group, x)
        scaler = fit_standard_scaler(curves)
        scaled = scaler_transform(scaler, curves)
        pca = fit_pca(scaled, whiten=False)
        npc = n_components_for_variance(pca, target_variance)
        logger.info(
            "%s parameter PCA uses %d PCs to explain %.0f%% of the variance",
            group.name, npc, target_variance * 100,
        )
        z = pca_transform(pca, scaled, npc=npc)
        kept = np.delete(np.arange(current.shape[1]), list(group.indices))
        current = jnp.concatenate([current[:, kept], z], axis=1)
        new_min = np.concatenate(
            [np.delete(new_min, list(group.indices)), np.min(np.asarray(z), axis=0)]
        )
        new_max = np.concatenate(
            [np.delete(new_max, list(group.indices)), np.max(np.asarray(z), axis=0)]
        )
        scalers.append(scaler)
        pcas.append(pca)
        npcs.append(npc)
    state = ParamPCAState(scalers=tuple(scalers), pcas=tuple(pcas), npcs=tuple(npcs))
    return state, np.asarray(current), new_min, new_max


def apply_param_pca(
    state: ParamPCAState,
    groups: Sequence[ParamPCAGroup],
    x: jnp.ndarray,
) -> jnp.ndarray:
    """Apply the fitted transform to query parameters ``x`` (m, ndim_org).

    Jit-safe: group metadata and PC counts are static.  Mirrors the predict-
    time transform in the reference (src/emulator.py:492-549).  Requires 2-D
    input (the reference's 1-D branch is unsupported there too --
    SURVEY.md "quirks": it indexes ``X[p, 0]`` and would fail).
    """
    if x.ndim != 2:
        raise ValueError("apply_param_pca requires 2-D input (m, ndim)")
    current = x
    for group, scaler, pca, npc in zip(groups, state.scalers, state.pcas, state.npcs):
        curves = _eval_group_curves(group, x)
        z = pca_transform(pca, scaler_transform(scaler, curves), npc=npc)
        kept = np.delete(np.arange(current.shape[1]), list(group.indices))
        current = jnp.concatenate([current[:, kept], z], axis=1)
    return current


def pack_param_pca(state: ParamPCAState) -> tuple:
    """Flatten the fitted transform into a pytree of pure arrays.

    PC counts are baked in by pre-slicing the component matrices, so the
    packed form is jit-traceable as an *argument* (no static ints or bools
    among the leaves).  Param PCA is fit with ``whiten=False``, so the
    projection is just ``(scaled - pca_mean) @ comps^T``.
    """
    packed = []
    for scaler, pca, npc in zip(state.scalers, state.pcas, state.npcs):
        packed.append({
            "sc_mean": scaler.mean,
            "sc_scale": scaler.scale,
            "pca_mean": pca.mean,
            "comps": pca.components[:npc],
        })
    return tuple(packed)


def apply_param_pca_packed(packed: tuple, groups: Sequence[ParamPCAGroup], x: jnp.ndarray) -> jnp.ndarray:
    """Like :func:`apply_param_pca` but on the packed-array form, suitable
    for use inside jitted programs that take the transform as an argument."""
    current = x
    for group, g in zip(groups, packed):
        curves = _eval_group_curves(group, x)
        scaled = (curves - g["sc_mean"]) / g["sc_scale"]
        z = (scaled - g["pca_mean"]) @ g["comps"].T
        kept = np.delete(np.arange(current.shape[1]), list(group.indices))
        current = jnp.concatenate([current[:, kept], z], axis=1)
    return current
