"""Pallas TPU point->voxel scatter kernel (SURVEY.md C6 rebuild note,
BASELINE.json north star: "LiDAR point clouds voxelize into BEV occupancy grids
via a Pallas scatter kernel").

Design, shaped by the TPU memory model (pallas_guide.md):

  * The occupancy grid's z-extent is only 13 cells (256x256x13), and the last
    axis of a VMEM tile wants 128 lanes — so the kernel builds a **bit-packed
    (H, W) int32 grid** (bit z set <=> voxel (x, y, z) occupied): 256 KB VMEM
    instead of a 3.4 MB fp32 volume, with a perfectly tiled (8,128) layout.
    The caller unpacks bits to (H, W, Z) float with a vectorized shift-and-mask
    that XLA fuses into the consuming conv.
  * Scatter is inherently serial on TPU (no atomic vector scatter); the kernel
    runs a ``fori_loop`` over points on the scalar core doing read-modify-write
    ``grid[ix, iy] |= 1 << iz`` stores into VMEM. One grid program per
    (batch*agent) frame keeps frames independent and lets the per-frame loops
    overlap with the grid pipeline's DMAs.
  * Out-of-extent / non-finite / masked points are skipped with ``@pl.when``
    (same drop semantics as the numpy oracle).

Measured on the real TPU v5 lite chip (16384 points/frame, 24 frames,
2026-08-16): this kernel 2.99 ms/frame vs the XLA ``.at[].max`` scatter at
0.228 ms/frame (~13 cycles/point — XLA's serialized scatter is already near
speed-of-light for this op, and Mosaic's no-scalar-VMEM-store rule forces this
kernel into a (1, W)-row read-modify-write per point, ~13x more VMEM traffic).
The dispatcher default therefore stays ``impl='jax'``; this kernel remains as
the parity-tested Pallas path and the baseline for future kernel work. Either
way voxelization is <1% of end-to-end scene time (the conv stack dominates).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pts_ref, out_ref, *, lo, hi, vs, dims):
    """One frame block: pts (1, N, 4) f32 [x, y, z, valid] ->
    out (1, H, W) i32 bitpacked. The validity flag rides as a 4th point
    column so every VMEM block equals the array's trailing dims (Mosaic's
    (8, 128)-divisibility rule would reject a separate (1, N) i32 input)."""
    out_ref[:] = jnp.zeros_like(out_ref)
    n = pts_ref.shape[1]
    h, w = out_ref.shape[1], out_ref.shape[2]
    zdim = dims[2]

    def body(i, carry):
        x = pts_ref[0, i, 0]
        y = pts_ref[0, i, 1]
        z = pts_ref[0, i, 2]
        ix = jnp.floor((x - lo[0]) / vs[0]).astype(jnp.int32)
        iy = jnp.floor((y - lo[1]) / vs[1]).astype(jnp.int32)
        iz = jnp.floor((z - lo[2]) / vs[2]).astype(jnp.int32)
        ok = (
            (pts_ref[0, i, 3] > 0.0)
            & (x >= lo[0]) & (x < hi[0])
            & (y >= lo[1]) & (y < hi[1])
            & (z >= lo[2]) & (z < hi[2])
            & (ix >= 0) & (ix < h)
            & (iy >= 0) & (iy < w)
            & (iz >= 0) & (iz < zdim)
        )

        @pl.when(ok)
        def _():
            # Mosaic cannot store scalars to VMEM: read-modify-write the whole
            # (1, W) grid row with a lane mask instead — one VPU op per point
            row = out_ref[0, pl.ds(ix, 1), :]  # (1, W) int32
            lanes = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
            bit = jnp.where(lanes == iy, jnp.int32(1) << iz, jnp.int32(0))
            out_ref[0, pl.ds(ix, 1), :] = row | bit

        return carry

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("voxel_size", "extents", "interpret"))
def voxelize_occupy_pallas(
    points: jnp.ndarray,
    voxel_size: Tuple[float, float, float],
    extents: Tuple[Tuple[float, float], ...],
    mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """points (..., N, 3) [+ mask (..., N)] -> (..., H, W, Z) float32 occupancy.

    Matches :func:`disconet_tpu.ops.voxelize.voxelize_occupy_np` bit-for-bit
    (unit-tested); non-finite coordinates never hit the scatter because the
    int32 cast of a NaN/inf lands out of the guarded index range — they are
    additionally masked out on the host side of the kernel via ``valid``.
    """
    from disconet_tpu.ops.voxelize import grid_dims

    lo = tuple(float(np.float32(e[0])) for e in extents)
    hi = tuple(float(np.float32(e[1])) for e in extents)
    vs = tuple(float(np.float32(v)) for v in voxel_size)
    dims = grid_dims(voxel_size, extents)  # shared grid-shape rule
    H, W, Z = dims
    assert Z <= 32, "bit-packed z-axis supports up to 32 voxels"

    batch_shape = points.shape[:-2]
    n = points.shape[-2]
    flat_pts = points.reshape((-1, n, 3)).astype(jnp.float32)
    nb = flat_pts.shape[0]

    finite = jnp.all(jnp.isfinite(flat_pts), axis=-1)
    if mask is not None:
        finite = finite & mask.reshape((-1, n)).astype(bool)
    # non-finite coords could cast to an in-range int; zero them under the mask
    flat_pts = jnp.where(finite[..., None], flat_pts, jnp.float32(lo[0] - 1.0))
    pts4 = jnp.concatenate([flat_pts, finite[..., None].astype(jnp.float32)], axis=-1)

    kernel = functools.partial(_kernel, lo=lo, hi=hi, vs=vs, dims=dims)
    packed = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, n, 4), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, H, W), jnp.int32),
        interpret=interpret,
    )(pts4)

    bits = jnp.arange(Z, dtype=jnp.int32)
    grid = ((packed[..., None] >> bits) & 1).astype(jnp.float32)  # (nb, H, W, Z)
    return grid.reshape(batch_shape + (H, W, Z))
