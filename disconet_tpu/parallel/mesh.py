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


def make_mesh(n_data: Optional[int] = None, n_agent: int = 1, devices=None) -> Mesh:
    """1-D (or 2-D with an agent axis) mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_agent
    devices = devices[: n_data * n_agent].reshape(n_data, n_agent)
    return Mesh(devices, axis_names=("data", "agent"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Scene batches sharded over the data axis; agents sharded over the agent
    axis when it has size > 1 (leading axes: batch, agent)."""
    if mesh.shape["agent"] > 1:
        return NamedSharding(mesh, P("data", "agent"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, jax.Array]:
    """Host batch -> device arrays with the scene axis sharded over 'data'."""
    from disconet_tpu.ops.bitpack import pack_bev_np

    bs = batch_sharding(mesh)
    rep = replicated(mesh)
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
        sh = bs if arr.ndim >= 1 and arr.shape[0] % mesh.shape["data"] == 0 else rep
        out[k] = jax.device_put(arr, sh)
    return out


def replicate_tree(tree, mesh: Mesh):
    """Replicate a parameter/state pytree across the mesh."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
