"""Device-mesh and sharding helpers."""

from lidal_tpu.parallel.mesh import make_mesh, shard_batch_spec, replicated_spec  # noqa: F401
