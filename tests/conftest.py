"""Test configuration: run on a virtual 8-device CPU mesh with x64 parity.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count=8`` per SURVEY.md section 4(e).
x64 is enabled so golden-value parity tests against the float64 reference
stack (sklearn / scipy) are exact to tolerance.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not honored on this image (a TPU tunnel plugin wins),
# so force the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def toy_parfile(tmp_path):
    """3-parameter toy file matching examples/modelDesign_example.txt format."""
    p = tmp_path / "model_params.txt"
    p.write_text(
        "p0: $p_0$, 0.0, 1.0  # first parameter\n"
        "# a full-line comment\n"
        "p1: $p_1$, -2.0, 2.0\n"
        "p2: $p_2$, 10.0, 30.0\n"
    )
    return p


def make_training_pickle(path, design, obs_mean, obs_err):
    """Write a training pickle in the reference schema:
    {event_id(str): {"parameter": (ndim,), "obs": (2, nobs)}}."""
    import pickle

    data = {}
    for i in range(design.shape[0]):
        data[str(i)] = {
            "parameter": design[i],
            "obs": np.stack([obs_mean[i], obs_err[i]], axis=0),
        }
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return path


@pytest.fixture
def training_pickle_factory():
    return make_training_pickle
