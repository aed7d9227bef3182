"""Sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpbayestools_hic_tpu.parallel import make_mesh, shard_batch, sharded_log_prob


pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def test_mesh_and_shard_batch():
    mesh = make_mesh(8)
    x = jnp.arange(32.0 * 3).reshape(32, 3)
    xs = shard_batch(mesh, x)
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_sharded_log_prob_matches_unsharded():
    mesh = make_mesh(8)
    state = {"mu": jnp.asarray([0.3, 0.7]), "w": jnp.eye(2) * 2.0}

    def log_prob(s, x):
        d = x - s["mu"]
        return -0.5 * jnp.einsum("bi,ij,bj->b", d, s["w"], d)

    x = jax.random.uniform(jax.random.PRNGKey(0), (40, 2))
    expected = log_prob(state, x)
    xs = shard_batch(mesh, x)
    f = sharded_log_prob(log_prob, mesh, state=state)
    got = f(xs)
    assert len(got.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-12)


def test_sharded_ensemble_step_matches_single_device():
    """One stretch-move step gives identical results sharded vs not."""
    from gpbayestools_hic_tpu.samplers.ensemble import run_ensemble

    mesh = make_mesh(8)
    state = {"mu": jnp.asarray([0.2, 0.8, 0.5])}

    def log_prob(s, x):
        return -0.5 * jnp.sum((x - s["mu"]) ** 2, axis=-1)

    x0 = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    r_plain = run_ensemble(log_prob, x0, 5, jax.random.PRNGKey(2), state=state)
    r_shard = run_ensemble(
        log_prob, shard_batch(mesh, x0), 5, jax.random.PRNGKey(2), state=state
    )
    np.testing.assert_allclose(
        np.asarray(r_plain.final_state), np.asarray(r_shard.final_state),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(r_plain.chain), np.asarray(r_shard.chain), rtol=1e-6
    )


def test_dryrun_multichip_entrypoint():
    """The driver-facing dry run must pass on the virtual mesh."""
    import subprocess
    import sys

    res = subprocess.run(
        [sys.executable, "__graft_entry__.py", "8"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "multichip dry run PASSED on 8 devices" in res.stdout
