"""Pallas MVN kernel correctness (interpreter mode; compiled path is
exercised on real TPU by bench/manual runs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gpbayestools_hic_tpu.ops.pallas_mvn as pm
from gpbayestools_hic_tpu.ops.linalg import mvn_loglike_batch


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pm, "INTERPRET", True)


@pytest.mark.parametrize("b,n", [(4, 1), (4, 2), (4, 3), (4, 7), (2, 60), (8, 130)])
def test_pallas_mvn_matches_xla(rng, b, n):
    a = rng.normal(size=(b, n, n)).astype(np.float32)
    cov = jnp.asarray(a @ a.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32))
    y = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32))
    got = pm.mvn_loglike_pallas(y, cov)
    want = mvn_loglike_batch(y, cov)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4)


def test_pallas_mvn_nonpd_gives_neg_inf(rng):
    n = 12
    cov = -jnp.asarray(np.eye(n, dtype=np.float32))[None]
    y = jnp.asarray(rng.normal(size=(1, n)).astype(np.float32))
    assert np.asarray(pm.mvn_loglike_pallas(y, cov))[0] == -np.inf


@pytest.mark.slow
def test_pallas_mvn_gradients_match_xla(rng):
    """The custom VJP must agree with autodiff through the XLA path."""
    b, n = 2, 10
    a = rng.normal(size=(b, n, n)).astype(np.float32)
    cov = jnp.asarray(a @ a.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32))
    y = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32))

    g_pl = jax.grad(lambda y, c: jnp.sum(pm.mvn_loglike_pallas(y, c)),
                    argnums=(0, 1))(y, cov)
    g_xla = jax.grad(lambda y, c: jnp.sum(mvn_loglike_batch(y, c)),
                     argnums=(0, 1))(y, cov)
    np.testing.assert_allclose(np.asarray(g_pl[0]), np.asarray(g_xla[0]),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pl[1]), np.asarray(g_xla[1]),
                               rtol=1e-3, atol=1e-5)


def test_pallas_mvn_nonpd_gradient_is_zero_not_nan(rng):
    """A non-PD batch element maps to -inf in the forward (rejection); its
    gradient must be ZERO, not NaN -- a NaN would ride through every later
    leapfrog update and invalidate the whole HMC trajectory (round-4
    review finding).  Healthy elements in the same batch keep their
    gradients."""
    n = 8
    a = rng.normal(size=(n, n)).astype(np.float32)
    good_cov = a @ a.T + n * np.eye(n, dtype=np.float32)
    bad_cov = -np.eye(n, dtype=np.float32)
    cov = jnp.asarray(np.stack([good_cov, bad_cov]))
    y = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))

    gy, gc = jax.grad(
        lambda y, c: jnp.sum(
            jnp.where(jnp.isfinite(pm.mvn_loglike_pallas(y, c)),
                      pm.mvn_loglike_pallas(y, c), 0.0)
        ),
        argnums=(0, 1),
    )(y, cov)
    assert np.all(np.isfinite(np.asarray(gy))), gy
    assert np.all(np.isfinite(np.asarray(gc))), gc
    np.testing.assert_array_equal(np.asarray(gy)[1], 0.0)
    np.testing.assert_array_equal(np.asarray(gc)[1], 0.0)
    assert np.abs(np.asarray(gy)[0]).max() > 0
