"""Device-mesh sharding for walker-parallel likelihood evaluation."""

from .mesh import (  # noqa: F401
    check_divisible,
    make_mesh,
    replicate,
    resolve_mesh,
    shard_batch,
    sharded_log_prob,
)
