"""Sharding / device-mesh utilities (SURVEY.md §3 parallelism table, §5.8)."""

from disconet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate_tree,
)
from disconet_tpu.parallel.spatial import (  # noqa: F401
    conv2d_spatial_sharded,
    halo_exchange,
    sharded_conv_fn,
)
