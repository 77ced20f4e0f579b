"""Point-cloud -> binary BEV occupancy voxelization (SURVEY.md C6).

Reference: ``coperception/utils/data_util.voxelize_occupy`` (MotionNet-derived,
/root/reference/README.md:104) — a numpy scatter run inside CPU dataloader
workers. The TPU rebuild moves voxelization on device so the whole
voxelize->encode->fuse->detect path is one XLA graph (BASELINE.json north star):

* :func:`voxelize_occupy_np`   — numpy oracle (bit-for-bit contract).
* :func:`voxelize_occupy_jax`  — XLA scatter (`.at[].max` with drop-mode OOB).
* :func:`voxelize_occupy`      — dispatcher; `impl='pallas'` uses the Pallas
  scatter kernel in ops/pallas/voxelize_pallas.py.

Points are padded to a static N with a validity mask (or NaN padding); out-of-
extent and invalid points are dropped, matching the oracle.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def grid_dims(voxel_size, extents) -> Tuple[int, ...]:
    """THE grid-shape rule, shared by all three implementations (np oracle,
    XLA, Pallas): cell boundaries are the float32-rounded extents (the data
    contract — points and device math are f32), the count division runs in
    float64 with a 1e-9 guard against representation error. Keeping one copy
    guarantees the implementations can never disagree on the grid shape."""
    lo = np.array([e[0] for e in extents], dtype=np.float32)
    hi = np.array([e[1] for e in extents], dtype=np.float32)
    vs = np.asarray(voxel_size, dtype=np.float32)
    counts = (hi.astype(np.float64) - lo.astype(np.float64)) / vs.astype(np.float64)
    return tuple(int(d) for d in np.ceil(counts - 1e-9).astype(np.int64))


def voxelize_occupy_np(
    points: np.ndarray,
    voxel_size: Sequence[float],
    extents: Sequence[Tuple[float, float]],
    mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Numpy oracle: (N, 3) points -> (H, W, Z) uint8/float32 binary occupancy.

    Index arithmetic is float32 on purpose: LiDAR points are float32 and the
    on-device implementations (XLA scatter, Pallas kernel) compute in float32,
    so the oracle must round cell boundaries identically to be a bit-for-bit
    contract. ``mask`` (N,) drops padding rows, as in the device paths.
    """
    points = np.asarray(points, dtype=np.float32)
    lo = np.array([e[0] for e in extents], dtype=np.float32)
    hi = np.array([e[1] for e in extents], dtype=np.float32)
    vs = np.asarray(voxel_size, dtype=np.float32)
    dims = np.asarray(grid_dims(voxel_size, extents), dtype=np.int64)
    grid = np.zeros(tuple(dims), dtype=np.float32)
    if points.size == 0:
        return grid
    finite = np.all(np.isfinite(points), axis=-1)
    idx = np.floor((points - lo) / vs).astype(np.int64)
    ok = finite & np.all((points >= lo) & (points < hi), axis=-1)
    ok &= np.all((idx >= 0) & (idx < dims), axis=-1)
    if mask is not None:
        ok &= np.asarray(mask).astype(bool)
    idx = idx[ok]
    grid[idx[:, 0], idx[:, 1], idx[:, 2]] = 1.0
    return grid


def _geometry(voxel_size, extents):
    lo = np.array([e[0] for e in extents], dtype=np.float32)
    hi = np.array([e[1] for e in extents], dtype=np.float32)
    vs = np.asarray(voxel_size, dtype=np.float32)
    return lo, hi, vs, grid_dims(voxel_size, extents)


@functools.partial(jax.jit, static_argnames=("voxel_size", "extents"))
def voxelize_occupy_jax(
    points: jnp.ndarray,
    voxel_size: Tuple[float, float, float],
    extents: Tuple[Tuple[float, float], ...],
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """XLA scatter voxelizer. points (..., N, 3) -> (..., H, W, Z) float32.

    Leading batch dims are vmapped. Invalid rows (mask==False, non-finite, or
    out-of-extent) scatter to a clamped index guarded by `mode='drop'` via an
    out-of-range sentinel.
    """
    lo, hi, vs, dims = _geometry(voxel_size, extents)
    lo_j, hi_j, vs_j = jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(vs)
    dims_j = jnp.asarray(dims, dtype=jnp.int32)

    def _single(pts, m):
        finite = jnp.all(jnp.isfinite(pts), axis=-1)
        pts_safe = jnp.where(finite[..., None], pts, lo_j - 1.0)
        idx = jnp.floor((pts_safe - lo_j) / vs_j).astype(jnp.int32)
        ok = finite & jnp.all((pts_safe >= lo_j) & (pts_safe < hi_j), axis=-1)
        ok &= jnp.all((idx >= 0) & (idx < dims_j), axis=-1)
        if m is not None:
            ok &= m.astype(bool)
        # scatter-SET, not max: every update writes the constant 1.0, so
        # duplicate indices commute and set == max bit-for-bit, and the set
        # scatter avoids the read-modify-compare (measured ~25% faster on
        # v5e). Scatter straight into (H, W, Z) — a flat 1-D scatter is
        # marginally faster in isolation but the reshape back to (H, W, Z)
        # costs a tiled-layout relayout that loses more than it saves.
        # OOB sentinel -> dropped by mode='drop'.
        idx = jnp.where(ok[..., None], idx, dims_j)
        grid = jnp.zeros(dims, dtype=jnp.float32)
        return grid.at[idx[:, 0], idx[:, 1], idx[:, 2]].set(1.0, mode="drop")

    batch_shape = points.shape[:-2]
    if batch_shape:
        flat_pts = points.reshape((-1,) + points.shape[-2:])
        flat_mask = None if mask is None else mask.reshape((-1,) + mask.shape[-1:])
        if flat_mask is None:
            out = jax.vmap(lambda p: _single(p, None))(flat_pts)
        else:
            out = jax.vmap(_single)(flat_pts, flat_mask)
        return out.reshape(batch_shape + dims)
    return _single(points, mask)


def voxelize_occupy(points, voxel_size, extents, mask=None, impl: str = "jax"):
    """Dispatcher over voxelizer implementations ('np' | 'jax' | 'pallas')."""
    if impl == "np":
        return voxelize_occupy_np(np.asarray(points), voxel_size, extents, mask=mask)
    if impl == "pallas":
        from disconet_tpu.ops.pallas.voxelize_pallas import voxelize_occupy_pallas

        return voxelize_occupy_pallas(points, voxel_size, extents, mask=mask)
    return voxelize_occupy_jax(
        jnp.asarray(points), tuple(voxel_size), tuple(map(tuple, extents)), mask=mask
    )
