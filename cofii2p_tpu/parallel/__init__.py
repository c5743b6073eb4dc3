"""Scale-out: device mesh + sharding helpers (DP over ICI)."""

from cofii2p_tpu.parallel.mesh import make_mesh, shard_host_batch

__all__ = ["make_mesh", "shard_host_batch"]
