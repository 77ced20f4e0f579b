"""Pose-aware differentiable feature warping (SURVEY.md C12).

Reference ``DetModelBase.feature_transformation`` turns a 4x4 relative pose into a
2x3 affine and calls ``torch.nn.functional.affine_grid`` + ``grid_sample`` (zeros
padding) once per (receiver, sender) pair inside python loops. Here:

* :func:`affine_grid` / :func:`grid_sample` — torch-convention equivalents
  (align_corners=False, bilinear, zero padding), unit-tested bit-for-bit against
  torch CPU (SURVEY.md §5.1; §7 "hard parts" — wrong conventions shift features
  half a pixel and wreck distillation).
* :func:`warp_features` — metric-space warp of a whole (A, H, W, C) stack for all
  (receiver, sender) pairs in one vmapped gather: (A, A, H, W, C) out. This is
  pure XLA (gathers + FMAs) and fuses into the surrounding graph — no per-pair
  kernel launches, killing the reference's O(B*A^2) python loop.

Convention: feature/BEV grids are (H, W, C) with axis 0 = metric x, axis 1 =
metric y (matching the voxelizer). ``trans[i, j]`` maps homogeneous sender-j
coordinates into receiver-i's frame: p_i = T_ij @ p_j.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# torch-convention primitives (parity oracles for the metric-space warp)
# ---------------------------------------------------------------------------

def affine_grid(theta: jnp.ndarray, size: tuple, align_corners: bool = False) -> jnp.ndarray:
    """torch.nn.functional.affine_grid equivalent.

    Args:
        theta: (N, 2, 3) affine matrices over normalized coords.
        size: (N, C, H, W) torch-style size tuple.
    Returns:
        (N, H, W, 2) sampling grid, last dim (x, y) in [-1, 1] normalized coords.
    """
    N, _, H, W = size
    if align_corners:
        xs = jnp.linspace(-1.0, 1.0, W)
        ys = jnp.linspace(-1.0, 1.0, H)
    else:
        xs = (2.0 * jnp.arange(W) + 1.0) / W - 1.0
        ys = (2.0 * jnp.arange(H) + 1.0) / H - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)
    # explicit FMAs instead of einsum: keeps fp32 on TPU (no bf16 MXU rounding)
    t = theta[:, None, None, :, :]  # (N, 1, 1, 2, 3)
    out_x = t[..., 0, 0] * gx + t[..., 0, 1] * gy + t[..., 0, 2]
    out_y = t[..., 1, 0] * gx + t[..., 1, 1] * gy + t[..., 1, 2]
    return jnp.stack([out_x, out_y], axis=-1)  # (N, H, W, 2)


def _bilinear_zeros(feat: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of feat (H, W, C) at pixel coords (px: axis0, py: axis1).

    Out-of-bounds taps contribute zero (torch padding_mode='zeros').
    px/py are any common shape S; returns S + (C,).
    """
    H, W = feat.shape[0], feat.shape[1]
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx1 = px - x0
    wy1 = py - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(xi, yi, w):
        inb = (xi >= 0) & (xi < H) & (yi >= 0) & (yi < W)
        xc = jnp.clip(xi, 0, H - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, W - 1).astype(jnp.int32)
        vals = feat[xc, yc]  # gather in feat's own dtype (bf16 halves traffic)
        # tap weights stay f32; the product promotes, accumulation is f32
        return vals * (w.astype(jnp.float32) * inb.astype(jnp.float32))[..., None]

    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    out = tap(x0i, y0i, wx0 * wy0)
    out += tap(x0i + 1, y0i, wx1 * wy0)
    out += tap(x0i, y0i + 1, wx0 * wy1)
    out += tap(x0i + 1, y0i + 1, wx1 * wy1)
    return out.astype(feat.dtype)


def grid_sample(
    input_nchw: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = False
) -> jnp.ndarray:
    """torch.nn.functional.grid_sample equivalent (bilinear, zeros padding).

    Args:
        input_nchw: (N, C, H, W).
        grid: (N, Ho, Wo, 2) normalized (x, y) coords; x indexes W, y indexes H.
    Returns:
        (N, C, Ho, Wo).
    """
    N, C, H, W = input_nchw.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (W - 1)
        iy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        ix = ((gx + 1.0) * W - 1.0) * 0.5
        iy = ((gy + 1.0) * H - 1.0) * 0.5

    feat_hwc = jnp.moveaxis(input_nchw, 1, -1)  # (N, H, W, C)
    # _bilinear_zeros treats axis0 as "px": here axis0 of feat is H indexed by iy.
    out = jax.vmap(_bilinear_zeros)(feat_hwc, iy, ix)  # (N, Ho, Wo, C)
    return jnp.moveaxis(out, -1, 1)


# ---------------------------------------------------------------------------
# metric-space warp used by the fusion core
# ---------------------------------------------------------------------------

def pose_to_affine(trans: jnp.ndarray) -> jnp.ndarray:
    """Invert the xy block of p_i = T_ij p_j -> 2x3 affine mapping receiver->sender.

    trans: (..., 4, 4). Returns (..., 2, 3) [R' | t'] such that
    m_sender = R' @ m_receiver + t' in metric coords. Uses the general 2x2
    inverse (handles scale/shear if present, exact for rigid transforms).
    """
    R = trans[..., 0:2, 0:2]
    t = trans[..., 0:2, 3]
    det = R[..., 0, 0] * R[..., 1, 1] - R[..., 0, 1] * R[..., 1, 0]
    det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    inv = jnp.stack(
        [
            jnp.stack([R[..., 1, 1], -R[..., 0, 1]], axis=-1),
            jnp.stack([-R[..., 1, 0], R[..., 0, 0]], axis=-1),
        ],
        axis=-2,
    ) / det[..., None, None]
    # explicit FMAs (fp32 on TPU; a 2-vector einsum would hit bf16 MXU rounding)
    t_inv = -jnp.stack(
        [
            inv[..., 0, 0] * t[..., 0] + inv[..., 0, 1] * t[..., 1],
            inv[..., 1, 0] * t[..., 0] + inv[..., 1, 1] * t[..., 1],
        ],
        axis=-1,
    )
    return jnp.concatenate([inv, t_inv[..., None]], axis=-1)  # (..., 2, 3)


def _sample_coords(trans: jnp.ndarray, extent_xy: tuple, H: int, W: int):
    """Shared coordinate math: (A, A, 2, 3) affines -> sender pixel coords
    (A, A, H, W) px, py for every receiver pixel."""
    (x_lo, x_hi), (y_lo, y_hi) = extent_xy
    cell_x = (x_hi - x_lo) / H
    cell_y = (y_hi - y_lo) / W
    mx = x_lo + (jnp.arange(H) + 0.5) * cell_x
    my = y_lo + (jnp.arange(W) + 0.5) * cell_y
    gx, gy = jnp.meshgrid(mx, my, indexing="ij")  # (H, W)
    aff = pose_to_affine(trans)  # (A, A, 2, 3)
    sx = aff[..., 0, 0, None, None] * gx + aff[..., 0, 1, None, None] * gy + aff[..., 0, 2, None, None]
    sy = aff[..., 1, 0, None, None] * gx + aff[..., 1, 1, None, None] * gy + aff[..., 1, 2, None, None]
    px = (sx - x_lo) / cell_x - 0.5
    py = (sy - y_lo) / cell_y - 0.5
    return px, py  # (A, A, H, W)


def warp_features_matmul(
    feats: jnp.ndarray,
    trans: jnp.ndarray,
    extent_xy: tuple,
) -> jnp.ndarray:
    """MXU formulation of :func:`warp_features` (same signature/output).

    TPU gathers serialize; a bilinear warp of an (H, W, C) map is a sparse
    (H*W, H*W) linear operator with 4 taps per row. Materializing it as a
    dense one-hot matrix and contracting on the MXU is much faster at the
    fusion layer's 32x32 grid (P=Q=1024): build W = sum_tap w_tap * onehot(q_tap)
    in f32, then out[p, c] = sum_q W[p, q] feat[q, c]. Out-of-FoV taps get
    weight zero, reproducing the gather version's zero padding exactly.

    Accuracy: the matmul runs with f32 accumulation; W is cast to bf16 when
    feats are bf16 (tap-weight quantization ~4e-3 relative — far below the
    half-pixel level that matters for distillation; the f32 path is exact).
    """
    A, H, W, C = feats.shape
    Q = H * W
    px, py = _sample_coords(trans, extent_xy, H, W)  # (A, A, H, W)
    px = px.reshape(A, A, Q)
    py = py.reshape(A, A, Q)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx1 = px - x0
    wy1 = py - y0

    def tap_mat(xi, yi, w):
        inb = (xi >= 0) & (xi < H) & (yi >= 0) & (yi < W)
        q = (jnp.clip(xi, 0, H - 1) * W + jnp.clip(yi, 0, W - 1)).astype(jnp.int32)
        w = w * inb.astype(jnp.float32)
        # (A, A, P, Q) one-hot scaled by tap weight
        return w[..., None] * jax.nn.one_hot(q, Q, dtype=jnp.float32)

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    Wmat = (
        tap_mat(x0i, y0i, (1 - wx1) * (1 - wy1))
        + tap_mat(x0i + 1, y0i, wx1 * (1 - wy1))
        + tap_mat(x0i, y0i + 1, (1 - wx1) * wy1)
        + tap_mat(x0i + 1, y0i + 1, wx1 * wy1)
    )  # (A, A, P, Q)
    feat_flat = feats.reshape(A, Q, C)
    wm = Wmat.astype(feats.dtype)
    if feats.dtype == jnp.bfloat16 and jax.default_backend() != "tpu":
        # CPU's DotThunk lacks BF16 x BF16 = F32; keep the bf16 tap/feature
        # quantization (rounding parity with the TPU path) but dot in f32
        wm, feat_flat = wm.astype(jnp.float32), feat_flat.astype(jnp.float32)
    out = jnp.einsum(
        "ijpq,jqc->ijpc",
        wm,
        feat_flat,
        preferred_element_type=jnp.float32,
    )
    return out.astype(feats.dtype).reshape(A, A, H, W, C)


def warp_features(
    feats: jnp.ndarray,
    trans: jnp.ndarray,
    extent_xy: tuple,
) -> jnp.ndarray:
    """Warp every sender's feature map into every receiver's frame.

    Args:
        feats: (A, H, W, C) per-agent feature maps (axis 0 of H = metric x).
        trans: (A, A, 4, 4), trans[i, j] maps sender-j coords -> receiver-i frame.
        extent_xy: ((x_lo, x_hi), (y_lo, y_hi)) metric extents of the map.

    Returns:
        warped: (A_recv, A_send, H, W, C); warped[i, j] is sender j's features
        expressed in receiver i's grid, zeros outside sender FoV.
    """
    A, H, W, C = feats.shape
    # shared coordinate math with the matmul formulation — the half-pixel
    # convention (§7 "hard parts") lives in exactly one place
    px, py = _sample_coords(trans, extent_xy, H, W)  # (A, A, H, W)

    # outer vmap: receivers i; inner: sample each sender j at coords[i, j]
    def per_receiver(px_i, py_i):  # (A, H, W) each
        return jax.vmap(_bilinear_zeros)(feats, px_i, py_i)  # (A, H, W, C)

    return jax.vmap(per_receiver)(px, py)  # (A, A, H, W, C)
