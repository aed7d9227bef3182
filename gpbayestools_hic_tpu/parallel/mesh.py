"""Walker-parallel scaling over a JAX device mesh.

The reference's only parallelism is a 12-process multiprocessing pool inside
pocoMC (src/mcmc.py:775-776, 804) and vectorized-batch walker evaluation via
the ``pool=self`` trick (src/mcmc.py:335-342).  The TPU-native equivalent
(SURVEY.md section 5): a 1-D mesh with a ``walkers`` axis.  The likelihood is
embarrassingly parallel across walkers -- each chip holds a walker shard plus
a replicated copy of the (small) emulator state, evaluates its shard with
zero communication, and collectives only appear at ensemble-update/swap
points where XLA inserts them automatically from the sharding constraints.

GP training data is tiny (<= ~1100 x 20 doubles) so emulator state is
replicated; nothing here needs DCN.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "walkers") -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices (all if None)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            # devices[:n] would silently truncate and hand back a smaller
            # mesh than the caller asked for
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} "
                "available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def resolve_mesh(
    devices: int | None = None,
    mesh: Mesh | None = None,
    axis_name: str = "walkers",
) -> Mesh | None:
    """One-knob mesh resolution for the ``Chain`` sampler front-ends.

    Replaces the reference's ``pool=12`` process-pool ergonomics
    (src/mcmc.py:775-804) with a device count: ``mesh`` wins if given;
    ``devices=N`` builds a 1-D walker mesh over the first N devices;
    ``devices=-1`` uses all devices; ``None``/0/1 means no sharding.
    """
    if mesh is not None:
        return mesh
    if devices is None or devices in (0, 1):
        return None
    if devices < -1:
        raise ValueError(
            f"devices must be a positive count or -1 (all), got {devices}"
        )
    n = None if devices == -1 else devices
    return make_mesh(n, axis_name)  # raises if n exceeds available devices


def replicate(mesh: Mesh, tree):
    """Place every leaf of ``tree`` fully replicated over ``mesh``."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def check_divisible(mesh: Mesh, n: int, what: str = "walkers") -> None:
    """Sharding a batch axis requires it to divide evenly over the mesh."""
    size = mesh.devices.size
    if n % size:
        raise ValueError(
            f"{what} count {n} is not divisible by the {size}-device mesh; "
            f"choose a multiple of {size}"
        )


def shard_batch(mesh: Mesh, x: jnp.ndarray, axis_name: str = "walkers"):
    """Place a (batch, ...) array with the batch dim sharded over the mesh."""
    spec = P(axis_name, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def sharded_log_prob(
    log_prob_fn: Callable[..., jnp.ndarray],
    mesh: Mesh,
    axis_name: str = "walkers",
    state=None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Wrap a batched log-prob so the walker batch stays sharded on device.

    The emulator/likelihood ``state`` pytree is passed as a replicated
    argument (never closure-captured: see models/emulator.py on the per-call
    re-upload penalty); the input/output walker axis is sharded.  XLA
    partitions the whole fused predict + likelihood program with no
    communication.
    """
    in_spec = NamedSharding(mesh, P(axis_name, None))
    out_spec = NamedSharding(mesh, P(axis_name))
    if state is None:
        return jax.jit(
            log_prob_fn, in_shardings=(in_spec,), out_shardings=out_spec
        )
    repl = NamedSharding(mesh, P())
    state_shardings = jax.tree.map(lambda _: repl, state)
    jitted = jax.jit(
        log_prob_fn,
        in_shardings=(state_shardings, in_spec),
        out_shardings=out_spec,
    )
    state_repl = jax.device_put(state, repl)
    return lambda x: jitted(state_repl, x)
