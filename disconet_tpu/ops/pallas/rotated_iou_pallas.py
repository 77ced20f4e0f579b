"""Pallas TPU kernel for the batched rotated-IoU matrix (SURVEY.md C8).

The XLA version of the Liang-Barsky IoU (ops/rotated_iou.py) materializes its
~50 (pairs,)-shaped intermediates in HBM between partially-fused elementwise
ops (~35 ms for 96x256x256 pairs on v5e). This kernel blocks the pair grid
into (BN, BM) VMEM tiles: per tile it reads only the two corner blocks
(a few KB), runs the whole clip pipeline on registers/VMEM, and writes one
(BN, BM) f32 tile — HBM traffic is exactly input boxes + output matrix.

Algorithm identical to ops/rotated_iou.py::_clip_pieces_area (Liang-Barsky
boundary pieces, asymmetric boundary tolerance so coincident edges count
once). Requires boxes with w, l > 0 (corner order then CCW by construction —
decoded/anchor boxes always satisfy this; the jnp version remains the general
fallback).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-9


def _corners(box):
    """box: tuple of (cx, cy, w, l, th) 2-D tiles -> list of 4 (x, y) CCW corners."""
    cx, cy, w, l, th = box
    c, s = jnp.cos(th), jnp.sin(th)
    hw, hl = 0.5 * w, 0.5 * l
    # CCW from (+w/2, +l/2), matching ops/boxes.box_corners
    offs = ((hw, hl), (-hw, hl), (-hw, -hl), (hw, -hl))
    return [(cx + c * dx - s * dy, cy + s * dx + c * dy) for dx, dy in offs]


def _pieces_area_ref(Px, Py, Cx, Cy, tol, pex, cex, zero):
    """Sum of clipped-edge shoelace contributions: P's edges inside quad C.

    Px/Py, Cx/Cy: (4, n) VMEM scratch refs of corner coordinates (rows indexed
    dynamically by the loop counter — Mosaic supports dynamic indexing on refs
    but not on values, and unrolling all 4x4x2 combinations put Mosaic compile
    time past 10 minutes). ``pex``/``cex`` lift a (n,) row to the (BN, BM)
    broadcast layout ((:, None) for P rows, (None, :) for C rows).
    """

    def edge_body(e, total):
        e1x, e1y = pex(Px[e]), pex(Py[e])
        e2x, e2y = pex(Px[(e + 1) % 4]), pex(Py[(e + 1) % 4])
        dx, dy = e2x - e1x, e2y - e1y
        dlen = jnp.sqrt(dx * dx + dy * dy)

        # inner plane loop unrolled (4x): all-f32 state, no nested scan —
        # the nested fori_loop with bool carries crashed the remote Mosaic
        # compile helper
        t_lo, t_hi, par_ok = zero, zero + 1.0, zero + 1.0
        for k in range(4):
            c1x, c1y = cex(Cx[k]), cex(Cy[k])
            c2x, c2y = cex(Cx[(k + 1) % 4]), cex(Cy[(k + 1) % 4])
            nx, ny = -(c2y - c1y), (c2x - c1x)  # inward normal (CCW)
            num = nx * (e1x - c1x) + ny * (e1y - c1y)
            den = nx * dx + ny * dy
            nlen = jnp.sqrt(nx * nx + ny * ny)
            ntol = tol * nlen
            # scale-aware parallel test: for exactly-parallel edges den is an
            # f32 rounding residue ~1e-7*|n||d| whose exact value depends on
            # FMA ordering (an absolute epsilon misclassifies it and t_cross
            # explodes)
            is_par = jnp.abs(den) < 1e-5 * nlen * dlen + _EPS
            t_cross = -(num + ntol) / jnp.where(is_par, 1.0, den)
            t_lo = jnp.where(~is_par & (den > 0), jnp.maximum(t_lo, t_cross), t_lo)
            t_hi = jnp.where(~is_par & (den < 0), jnp.minimum(t_hi, t_cross), t_hi)
            par_ok = jnp.where(~is_par | (num >= -ntol), par_ok, zero)
        alive = (t_hi > t_lo) & (par_ok > 0.5)
        q1x, q1y = e1x + t_lo * dx, e1y + t_lo * dy
        q2x, q2y = e1x + t_hi * dx, e1y + t_hi * dy
        return total + jnp.where(alive, 0.5 * (q1x * q2y - q1y * q2x), 0.0)

    return jax.lax.fori_loop(0, 4, edge_body, zero)


def _kernel(a_ref, b_ref, out_ref, ax, ay, bx, by, *, tol):
    """One (BN, BM) tile: a (1, BN, 5), b (1, BM, 5) -> iou (1, BN, BM).

    ax/ay (4, BN) and bx/by (4, BM) are VMEM scratch for the corner rows.
    """
    a = a_ref[0]  # (BN, 5)
    b = b_ref[0]  # (BM, 5)
    boxa = tuple(a[:, i][:, None] for i in range(5))  # (BN, 1) tiles
    boxb = tuple(b[:, i][None, :] for i in range(5))  # (1, BM) tiles
    for k, (x, y) in enumerate(_corners(boxa)):
        ax[k] = x[:, 0]
        ay[k] = y[:, 0]
    for k, (x, y) in enumerate(_corners(boxb)):
        bx[k] = x[0]
        by[k] = y[0]
    pex = lambda row: row[:, None]  # noqa: E731  (BN,) -> (BN, 1)
    cex = lambda row: row[None, :]  # noqa: E731  (BM,) -> (1, BM)
    zero = jnp.zeros(out_ref.shape[1:], jnp.float32)
    inter = _pieces_area_ref(ax, ay, bx, by, tol, pex, cex, zero) + _pieces_area_ref(
        bx, by, ax, ay, -tol, cex, pex, zero
    )
    inter = jnp.maximum(inter, 0.0)
    union = boxa[2] * boxa[3] + boxb[2] * boxb[3] - inter
    out_ref[0] = jnp.where(union > 1e-8, inter / union, 0.0)


@functools.partial(jax.jit, static_argnames=("block_n", "block_m", "tol", "interpret"))
def rotated_iou_matrix_pallas(
    boxes_a: jnp.ndarray,
    boxes_b: jnp.ndarray,
    block_n: int = 128,
    block_m: int = 128,
    tol: float = 1e-4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched rotated IoU: (B, N, 5) x (B, M, 5) -> (B, N, M) f32.

    N and M are padded to the block size internally (padding boxes have w=l=0
    and produce IoU 0). Boxes must have w, l > 0 (or 0 for padding).
    """
    squeeze = boxes_a.ndim == 2
    if squeeze:
        boxes_a, boxes_b = boxes_a[None], boxes_b[None]
    B, N, _ = boxes_a.shape
    M = boxes_b.shape[1]
    n_pad = (-N) % block_n
    m_pad = (-M) % block_m
    a = jnp.pad(boxes_a.astype(jnp.float32), ((0, 0), (0, n_pad), (0, 0)))
    b = jnp.pad(boxes_b.astype(jnp.float32), ((0, 0), (0, m_pad), (0, 0)))
    Np, Mp = N + n_pad, M + m_pad

    out = pl.pallas_call(
        functools.partial(_kernel, tol=tol),
        grid=(B, Np // block_n, Mp // block_m),
        in_specs=[
            pl.BlockSpec((1, block_n, 5), lambda b_, i, j: (b_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_m, 5), lambda b_, i, j: (b_, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_n, block_m), lambda b_, i, j: (b_, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Np, Mp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, block_n), jnp.float32),
            pltpu.VMEM((4, block_n), jnp.float32),
            pltpu.VMEM((4, block_m), jnp.float32),
            pltpu.VMEM((4, block_m), jnp.float32),
        ],
        interpret=interpret,
    )(a, b)
    out = out[:, :N, :M]
    return out[0] if squeeze else out
