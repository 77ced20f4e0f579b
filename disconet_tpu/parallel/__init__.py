"""Sharding / device-mesh utilities (SURVEY.md §3 parallelism table, §5.8)."""

from disconet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate_tree,
)
