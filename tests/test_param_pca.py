"""Parameter-space PCA tests: vectorized curves vs the reference's scalar
functions, and transform consistency at train/predict time."""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from gpbayestools_hic_tpu.models.param_pca import (
    ParamPCAGroup,
    apply_param_pca,
    default_groups,
    eta_over_s_vs_mu_B,
    fit_param_pca,
    y_loss_vs_y_init,
    zeta_over_s_vs_T,
)


@pytest.fixture(scope="module")
def reference_emulator_module(tmp_path_factory):
    """Import the read-only reference package for behavioral comparison."""
    os.environ.setdefault("WORKDIR", str(tmp_path_factory.mktemp("refwork")))
    sys.path.insert(0, "/root/reference")
    try:
        import src.emulator as ref_emulator  # noqa: F401

        yield ref_emulator
    finally:
        sys.path.remove("/root/reference")


def test_curves_match_reference_scalar_functions(rng, reference_emulator_module):
    ref = reference_emulator_module.Emulator.__new__(
        reference_emulator_module.Emulator
    )
    # zeta/s(T)
    T_grid = np.linspace(0.0, 0.5, 100)
    for _ in range(5):
        zmax, tz0, sp, sm = rng.uniform(0.01, 0.3, 4)
        expected = [
            ref.parametrization_zeta_over_s_vs_T(zmax, tz0, sp, sm, T, 0.0)
            for T in T_grid
        ]
        got = zeta_over_s_vs_T(
            jnp.asarray([[zmax, tz0, sp, sm]]), jnp.asarray(T_grid)
        )[0]
        np.testing.assert_allclose(got, expected, rtol=1e-6)
    # eta/s(mu_B) -- includes the mu_B=0 -> eta_4 quirk
    mu_grid = np.linspace(0.0, 0.6, 100)
    for _ in range(5):
        e0, e2, e4 = rng.uniform(0.01, 0.4, 3)
        expected = [
            ref.parametrization_eta_over_s_vs_mu_B(e0, e2, e4, mu) for mu in mu_grid
        ]
        got = eta_over_s_vs_mu_B(jnp.asarray([[e0, e2, e4]]), jnp.asarray(mu_grid))[0]
        np.testing.assert_allclose(got, expected, rtol=1e-6)
    assert float(
        eta_over_s_vs_mu_B(jnp.asarray([[0.1, 0.2, 0.3]]), jnp.asarray([0.0]))[0, 0]
    ) == pytest.approx(0.3)  # quirk: mu_B=0 falls through to eta_4
    # y_loss(y_init) -- includes the y_init=0 third-branch quirk
    y_grid = np.linspace(0.0, 6.2, 100)
    for _ in range(5):
        y2, y4, y6 = np.sort(rng.uniform(0.5, 3.0, 3))
        expected = [
            ref.parametrization_y_loss_vs_y_init(y2, y4, y6, y) for y in y_grid
        ]
        got = y_loss_vs_y_init(jnp.asarray([[y2, y4, y6]]), jnp.asarray(y_grid))[0]
        np.testing.assert_allclose(got, expected, rtol=1e-6)


def _toy_design(rng, nev=30):
    """20-parameter design matching the flagship layout."""
    lo = np.zeros(20)
    hi = np.ones(20)
    # physical-ish ranges for the viscosity blocks
    lo[15:19], hi[15:19] = 0.01, 0.3   # zeta params
    lo[12:15], hi[12:15] = 0.01, 0.4   # eta params
    lo[2:5], hi[2:5] = 0.5, 3.0        # yloss params
    design = lo + (hi - lo) * rng.uniform(size=(nev, 20))
    return design, lo, hi


def test_fit_apply_consistency(rng):
    """apply_param_pca on the training design reproduces the fitted design."""
    design, lo, hi = _toy_design(rng)
    state, new_design, new_min, new_max = fit_param_pca(design, lo, hi)
    applied = apply_param_pca(state, tuple(default_groups()), jnp.asarray(design))
    np.testing.assert_allclose(applied, new_design, rtol=1e-7, atol=1e-9)
    assert new_design.shape[0] == 30
    # 20 params - 10 replaced + sum(npcs)
    assert new_design.shape[1] == 10 + sum(state.npcs)
    assert new_min.shape == (new_design.shape[1],)
    np.testing.assert_allclose(new_min[10:], new_design[:, 10:].min(axis=0))


def test_group_order_validation(rng):
    design, lo, hi = _toy_design(rng)
    bad = [
        ParamPCAGroup("yloss", (2, 3, 4), tuple(np.linspace(0, 6.2, 100)), "yloss"),
        ParamPCAGroup("bulk", (15, 16, 17, 18), tuple(np.linspace(0, 0.5, 100)), "zeta"),
    ]
    with pytest.raises(ValueError):
        fit_param_pca(design, lo, hi, bad)


def test_splice_matches_reference_indexing(rng, reference_emulator_module):
    """The delete-and-append splice must agree with the reference's
    np.delete/np.concatenate sequence (src/emulator.py:156-157, 194-195,
    232-233) on the same inputs."""
    design, lo, hi = _toy_design(rng)
    state, new_design, _, _ = fit_param_pca(design, lo, hi)
    groups = default_groups()

    # Reproduce the reference splice with numpy, feeding our PC scores.
    from gpbayestools_hic_tpu.ops.scalers import pca_transform, scaler_transform
    from gpbayestools_hic_tpu.models.param_pca import _eval_group_curves

    current = design.copy()
    for group, scaler, pca, npc in zip(groups, state.scalers, state.pcas, state.npcs):
        curves = np.asarray(_eval_group_curves(group, jnp.asarray(design)))
        z = np.asarray(
            pca_transform(pca, scaler_transform(scaler, jnp.asarray(curves)), npc=npc)
        )
        current = np.delete(current, list(group.indices), axis=1)
        current = np.concatenate([current, z], axis=1)
    np.testing.assert_allclose(new_design, current, rtol=1e-10)
