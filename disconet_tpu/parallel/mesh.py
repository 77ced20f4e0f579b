"""Device mesh + shardings (SURVEY.md §5.8, BASELINE.json north star).

The reference has **no** distribution at all (single-process single-GPU,
SURVEY.md §3). The TPU-native equivalent is scene-batch data parallelism over
ICI: a 1-D ``data`` mesh, batches sharded on their leading (scene) axis,
parameters replicated, XLA inserting the gradient all-reduce. The mesh is
declared with a second ``agent`` axis available (size 1 by default) so a future
agent-axis sharding — where fusion's neighbor gather becomes an ICI all_gather,
the faithful analog of V2X communication — is a config change, not an API
change (SURVEY.md §5.7).

Everything goes through ``jax.jit`` auto-partitioning: we annotate inputs with
``NamedSharding`` and let GSPMD place the collectives. No hand-written
communication backend, matching the reference's absence of one.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None, n_agent: int = 1, n_spatial: int = 1, devices=None
) -> Mesh:
    """Mesh over the available devices: always a ``data`` axis, plus an
    ``agent`` axis and/or a ``spatial`` axis when sized > 1.

    ``spatial`` shards the BEV grid's H dimension (SURVEY.md §5.7: the grid is
    this model family's "sequence" axis). Under ``jit`` GSPMD inserts the conv
    halo exchanges itself; parallel/spatial.py holds the explicit shard_map
    formulation of the same exchange (unit-tested exact) for reference.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // (n_agent * n_spatial)
    shape = [("data", n_data), ("agent", n_agent), ("spatial", n_spatial)]
    # keep trailing axes out of the mesh while unused so existing 1-D/2-D
    # sharding specs (and their tests) are unchanged
    while len(shape) > 1 and shape[-1][1] == 1:
        shape.pop()
    names = tuple(n for n, _ in shape)
    devices = devices[: int(np.prod([s for _, s in shape]))].reshape(
        [s for _, s in shape]
    )
    return Mesh(devices, axis_names=names)


def _axis(mesh: Mesh, name: str) -> Optional[str]:
    """Axis name if present in the mesh with size > 1, else None (spec skips it)."""
    return name if name in mesh.axis_names and mesh.shape[name] > 1 else None


def batch_sharding(mesh: Mesh, spatial_dim: Optional[int] = None) -> NamedSharding:
    """Scene batches sharded over the data axis; agents over the agent axis
    when sized > 1 (leading axes: batch, agent); with ``spatial_dim`` given,
    that array dimension (the BEV H axis) is sharded over 'spatial'."""
    n = (spatial_dim + 1) if spatial_dim is not None else 2
    spec: list = [None] * n
    spec[0] = "data"
    if _axis(mesh, "agent"):
        spec[1] = "agent"
    if spatial_dim is not None and _axis(mesh, "spatial"):
        spec[spatial_dim] = "spatial"
    while spec and spec[-1] is None:
        spec.pop()
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# batch fields carrying the BEV H axis at dim 2 — shardable over 'spatial'
# (bitpacking only touches the trailing Z axis, so packed grids qualify too)
_SPATIAL_KEYS = frozenset(
    {"bev", "bev_teacher", "bev_packed", "bev_teacher_packed",
     "label_one_hot", "reg_target", "reg_mask", "seg_label"}
)


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, jax.Array]:
    """Host batch -> device arrays with the scene axis sharded over 'data'
    (+ agents over 'agent', the BEV H axis over 'spatial' where those mesh
    axes exist with size > 1)."""
    from disconet_tpu.ops.bitpack import pack_bev_np

    rep = replicated(mesh)
    n_agent = mesh.shape.get("agent", 1)
    n_spatial = mesh.shape.get("spatial", 1)

    def spec_for(arr: np.ndarray, k: str) -> NamedSharding:
        # per-array spec, truncated to its rank, axes applied only where the
        # dim divides evenly; dropping an axis never changes results under
        # jit — sharding is a layout choice, GSPMD keeps semantics
        if arr.ndim < 1 or arr.shape[0] % mesh.shape["data"] != 0:
            return rep
        spec: list = [None] * min(arr.ndim, 3)
        spec[0] = "data"
        if n_agent > 1 and arr.ndim > 1 and arr.shape[1] % n_agent == 0:
            spec[1] = "agent"
        if (
            n_spatial > 1
            and k in _SPATIAL_KEYS
            and arr.ndim > 2
            and arr.shape[2] % n_spatial == 0
        ):
            spec[2] = "spatial"
        while spec and spec[-1] is None:
            spec.pop()
        return NamedSharding(mesh, P(*spec))

    sparse = "reg_pos_idx" in batch
    out = {}
    for k, v in batch.items():
        if isinstance(v, list):  # ragged host-only fields (gt_boxes)
            continue
        if sparse and k in ("label_one_hot", "reg_target", "reg_mask"):
            continue  # redundant dense targets (training/det_module.py)
        arr = np.asarray(v)
        if k in ("bev", "bev_teacher") and arr.dtype in (np.uint8, np.bool_):
            # binary grids ship bit-packed (ops/bitpack.py; get_bev unpacks)
            arr, k = pack_bev_np(arr), k + "_packed"
        out[k] = jax.device_put(arr, spec_for(arr, k))
    return out


def replicate_tree(tree, mesh: Mesh):
    """Replicate a parameter/state pytree across the mesh."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
