"""Bit-packed BEV transport across the host->device boundary.

The binary occupancy grid is the bulk of every training/eval batch: at the
reference geometry (SURVEY.md C1) one batch of 4 scenes x 6 agents x
256x256x13 uint8 voxels is ~20 MB; with the teacher BEV (KD runs,
SURVEY.md C14) it doubles. On this target the host<->device link is the
training bottleneck (CLAUDE.md), so the z-column of 13 binary voxels ships
as 2 packed bytes instead of 13 — a 6.5x cut in transfer volume:

  * :func:`pack_bev_np`  — host side, ``np.packbits`` over the z axis;
  * :func:`unpack_bev`   — device side, shift/mask unpack inside the jitted
    step (one fused elementwise pass, negligible next to the conv stack).

Round-trip is exact for {0,1} grids (the voxelizer contract, ops/voxelize.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pack_bev_np(bev: np.ndarray) -> np.ndarray:
    """(..., Z) binary grid -> (..., ceil(Z/8)) uint8, np.packbits bitorder."""
    return np.packbits(np.asarray(bev) != 0, axis=-1)


def packed_width(z: int) -> int:
    return (z + 7) // 8


def unpack_bev_np(packed: np.ndarray, z: int, dtype=np.float32) -> np.ndarray:
    """Host (numpy) inverse of :func:`pack_bev_np` — for model init shapes,
    visualization, and tests; the hot path unpacks on device (unpack_bev)."""
    bits = np.unpackbits(np.asarray(packed), axis=-1)
    return bits[..., :z].astype(dtype)


def unpack_bev(packed: jnp.ndarray, z: int) -> jnp.ndarray:
    """Device inverse of :func:`pack_bev_np`: (..., ceil(Z/8)) uint8 -> (..., Z) f32.

    np.packbits packs big-endian within each byte (bit 0 of the input is the
    MSB of byte 0), so unpack shifts 7..0.
    """
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    bits = bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,))
    return bits[..., :z].astype(jnp.float32)
