"""Device-mesh sharding for walker-parallel likelihood evaluation."""

from .mesh import make_mesh, shard_batch, sharded_log_prob  # noqa: F401
