"""Spatial (halo-exchange) sharding for BEV convolutions (SURVEY.md §5.7).

The reference has no sequence axis; its long axis is the BEV grid itself. For
grids beyond 256^2 the TPU-native scaling move is to shard H over a mesh axis
and exchange 1-pixel halos between neighbor shards around each 3x3 conv —
structurally ring/context parallelism, but for conv halos (the "How to Scale
Your Model" recipe: pick a mesh, annotate shardings, let collectives ride ICI).

This module provides the primitive as a composable op:

* :func:`halo_exchange` — append the neighbor shards' boundary rows via two
  `lax.ppermute` shifts (zero padding at the global edges).
* :func:`conv2d_spatial_sharded` — SAME 3x3-family conv over an H-sharded
  array, exact vs the unsharded conv: exchange halos, run the local conv
  VALID over the padded strip.
* :func:`sharded_conv_fn` — wrap both in `shard_map` over a caller's mesh.

Tested on the 8-virtual-device CPU mesh (tests/test_parallel.py pattern);
stride-2 downsampling stages would additionally rebalance rows across shards,
which is out of v1 scope exactly as in SURVEY.md §5.7 — the mesh axis name
('spatial') is reserved so model-level adoption is additive.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def halo_exchange(x: jnp.ndarray, axis_name: str, halo: int = 1) -> jnp.ndarray:
    """Pad a (local_H, W, C) shard with its neighbors' boundary rows.

    Inside ``shard_map``: sends the top ``halo`` rows to the previous shard and
    the bottom ``halo`` rows to the next shard over the ``axis_name`` ring
    (`lax.ppermute` — lowers to an ICI neighbor exchange on real meshes). The
    first/last shards receive zeros, reproducing SAME-conv zero padding at the
    global boundary. Returns (local_H + 2*halo, W, C).
    """
    n = jax.lax.axis_size(axis_name)
    # neighbor boundary strips; shards not named as a ppermute destination
    # receive zeros — exactly SAME-conv zero padding at the global edges
    below = jax.lax.ppermute(  # shard i+1's first rows -> my bottom halo
        x[:halo], axis_name, [(i, i - 1) for i in range(1, n)]
    )
    above = jax.lax.ppermute(  # shard i-1's last rows -> my top halo
        x[-halo:], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    return jnp.concatenate([above, x, below], axis=0)


def conv2d_spatial_sharded(
    x: jnp.ndarray, w: jnp.ndarray, axis_name: str
) -> jnp.ndarray:
    """SAME stride-1 conv on an H-sharded (local_H, W, Cin) strip; exact vs the
    unsharded conv. ``w`` is (kh, kw, Cin, Cout) with odd kh."""
    kh, kw = w.shape[0], w.shape[1]
    assert kh % 2 == 1 and kw % 2 == 1, "SAME-conv equivalence needs odd kernels"
    halo = (kh - 1) // 2
    xp = halo_exchange(x, axis_name, halo=halo)
    return jax.lax.conv_general_dilated(
        xp[None],
        w,
        (1, 1),
        ((0, 0), ((kw - 1) // 2, (kw - 1) // 2)),  # VALID on H (halos), SAME on W
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]


def sharded_conv_fn(mesh: Mesh, axis: str = "spatial"):
    """Build ``fn(x, w) -> y`` where x (H, W, Cin) is H-sharded over ``axis``.

    The returned fn is jittable; XLA inserts the two neighbor ppermutes and
    keeps everything else local to each shard.
    """

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
    )
    def fn(x, w):
        return conv2d_spatial_sharded(x, w, axis)

    return fn
