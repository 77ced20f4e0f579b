"""Rotated-box BEV IoU (SURVEY.md C8, reference coperception/utils/detection_util.py).

The reference computes rotated-rectangle IoU on the host with shapely-style convex
polygon clipping (``polygon_clip`` / ``convex_hull_intersection`` lineage), one pair
at a time inside python loops. Here:

* :func:`rotated_iou_np` — exact numpy oracle (Sutherland–Hodgman + shoelace),
  used for host-side mAP matching and as the parity reference in tests.
* :func:`rotated_iou_matrix` — fully vectorized jnp (N, M) IoU matrix with static
  shapes, suitable for on-device NMS and anchor-target assignment. Uses the
  fixed-size candidate-point formulation (all edge-pair intersections + corners of
  each box contained in the other, sorted by angle around the centroid, shoelace
  with invalid slots collapsed onto the first vertex) so the whole computation is
  elementwise/VPU work under jit — no data-dependent shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from disconet_tpu.ops.boxes import box_corners, box_corners_np

_EPS = 1e-8


# ---------------------------------------------------------------------------
# numpy oracle
# ---------------------------------------------------------------------------

def _polygon_area_np(poly: np.ndarray) -> float:
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))


def _clip_polygon_np(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip `subject` polygon by convex CCW `clip` polygon."""
    output = list(subject)
    n = len(clip)
    for i in range(n):
        if not output:
            break
        a, b = clip[i], clip[(i + 1) % n]
        edge = b - a
        input_list, output = output, []
        for j, cur in enumerate(input_list):
            prev = input_list[j - 1]
            cur_in = edge[0] * (cur[1] - a[1]) - edge[1] * (cur[0] - a[0]) >= -_EPS
            prev_in = edge[0] * (prev[1] - a[1]) - edge[1] * (prev[0] - a[0]) >= -_EPS
            if cur_in:
                if not prev_in:
                    output.append(_line_intersect_np(prev, cur, a, b))
                output.append(cur)
            elif prev_in:
                output.append(_line_intersect_np(prev, cur, a, b))
    return np.asarray(output, dtype=np.float64).reshape(-1, 2)


def _line_intersect_np(p1, p2, a, b):
    d1, d2 = p2 - p1, b - a
    denom = d1[0] * d2[1] - d1[1] * d2[0]
    if abs(denom) < _EPS:
        return p2
    t = ((a[0] - p1[0]) * d2[1] - (a[1] - p1[1]) * d2[0]) / denom
    return p1 + t * d1


def _ccw_np(poly: np.ndarray) -> np.ndarray:
    x, y = poly[:, 0], poly[:, 1]
    signed = 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    return poly if signed >= 0 else poly[::-1]


def rotated_iou_np(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Exact (N, M) rotated IoU oracle. boxes are (.., 5) = (cx, cy, w, l, theta)."""
    boxes_a = np.atleast_2d(np.asarray(boxes_a, dtype=np.float64))
    boxes_b = np.atleast_2d(np.asarray(boxes_b, dtype=np.float64))
    ca = box_corners_np(boxes_a)  # (N, 4, 2)
    cb = box_corners_np(boxes_b)
    area_a = boxes_a[:, 2] * boxes_a[:, 3]
    area_b = boxes_b[:, 2] * boxes_b[:, 3]
    out = np.zeros((len(boxes_a), len(boxes_b)), dtype=np.float64)
    for i in range(len(boxes_a)):
        pa = _ccw_np(ca[i])
        for j in range(len(boxes_b)):
            inter_poly = _clip_polygon_np(pa, _ccw_np(cb[j]))
            inter = _polygon_area_np(inter_poly) if len(inter_poly) >= 3 else 0.0
            union = area_a[i] + area_b[j] - inter
            out[i, j] = inter / union if union > _EPS else 0.0
    return out


# ---------------------------------------------------------------------------
# vectorized numpy version (host-side: target assignment, mAP, SORT)
# ---------------------------------------------------------------------------

def _intersection_area_batched_np(ca: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """Vectorized candidate-point intersection area over (..., 4, 2) corner
    arrays — the numpy twin of :func:`_pairwise_intersection_area`, used on the
    host where XLA compile time would dominate (target assignment runs at
    data-creation time on thousands of small pair sets)."""
    eps = _EPS

    def force_ccw(c):
        x, y = c[..., 0], c[..., 1]
        signed = np.sum(x * np.roll(y, -1, axis=-1) - y * np.roll(x, -1, axis=-1), axis=-1)
        return np.where(signed[..., None, None] >= 0, c, c[..., ::-1, :])

    ca = force_ccw(np.asarray(ca, np.float64))
    cb = force_ccw(np.asarray(cb, np.float64))

    a1, a2 = ca, np.roll(ca, -1, axis=-2)
    b1, b2 = cb, np.roll(cb, -1, axis=-2)
    p = a1[..., :, None, :]
    r = (a2 - a1)[..., :, None, :]
    q = b1[..., None, :, :]
    s = (b2 - b1)[..., None, :, :]
    rxs = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    qmp = q - p
    t_num = qmp[..., 0] * s[..., 1] - qmp[..., 1] * s[..., 0]
    u_num = qmp[..., 0] * r[..., 1] - qmp[..., 1] * r[..., 0]
    denom = np.where(np.abs(rxs) < eps, 1.0, rxs)
    t = t_num / denom
    u = u_num / denom
    valid_int = (np.abs(rxs) >= eps) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    inter_pts = p + t[..., None] * r  # (..., 4, 4, 2)

    def inside(points, corners):
        # scale-invariant tolerance: see the jnp twin's comment
        e1, e2 = corners, np.roll(corners, -1, axis=-2)
        d = e2 - e1
        v = points[..., :, None, :] - e1[..., None, :, :]
        cross = d[..., None, :, 0] * v[..., 1] - d[..., None, :, 1] * v[..., 0]
        elen = np.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2)[..., None, :]
        return np.all(cross >= -1e-4 * (elen + eps), axis=-1)

    batch = ca.shape[:-2]
    pts = np.concatenate(
        [inter_pts.reshape(batch + (16, 2)), ca, cb], axis=-2
    )  # (..., 24, 2)
    valid = np.concatenate(
        [valid_int.reshape(batch + (16,)), inside(ca, cb), inside(cb, ca)], axis=-1
    )

    num_valid = valid.sum(axis=-1)
    centroid = np.where(valid[..., None], pts, 0.0).sum(axis=-2) / np.maximum(
        num_valid, 1
    )[..., None]
    ang = np.arctan2(pts[..., 1] - centroid[..., None, 1], pts[..., 0] - centroid[..., None, 0])
    ang = np.where(valid, ang, np.inf)
    order = np.argsort(ang, axis=-1)
    pts_sorted = np.take_along_axis(pts, order[..., None], axis=-2)
    valid_sorted = np.take_along_axis(valid, order, axis=-1)
    first = pts_sorted[..., :1, :]
    pts_closed = np.where(valid_sorted[..., None], pts_sorted, first)
    nxt = np.roll(pts_closed, -1, axis=-2)
    cross = pts_closed[..., 0] * nxt[..., 1] - pts_closed[..., 1] * nxt[..., 0]
    area = 0.5 * np.abs(cross.sum(axis=-1))
    return np.where(num_valid >= 3, area, 0.0)


def rotated_iou_pairs_np(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Elementwise rotated IoU (P,) over paired boxes, vectorized numpy."""
    boxes_a = np.asarray(boxes_a, np.float64).reshape(-1, 5)
    boxes_b = np.asarray(boxes_b, np.float64).reshape(-1, 5)
    inter = _intersection_area_batched_np(box_corners_np(boxes_a), box_corners_np(boxes_b))
    union = boxes_a[:, 2] * boxes_a[:, 3] + boxes_b[:, 2] * boxes_b[:, 3] - inter
    return np.where(union > _EPS, inter / union, 0.0)


def rotated_iou_matrix_np(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """(N, M) rotated IoU, vectorized numpy (host-side mAP / SORT hot path)."""
    boxes_a = np.atleast_2d(np.asarray(boxes_a, np.float64))
    boxes_b = np.atleast_2d(np.asarray(boxes_b, np.float64))
    ca = box_corners_np(boxes_a)[:, None]  # (N, 1, 4, 2)
    cb = box_corners_np(boxes_b)[None, :]  # (1, M, 4, 2)
    N, M = len(boxes_a), len(boxes_b)
    inter = _intersection_area_batched_np(
        np.broadcast_to(ca, (N, M, 4, 2)), np.broadcast_to(cb, (N, M, 4, 2))
    )
    union = (boxes_a[:, 2] * boxes_a[:, 3])[:, None] + (boxes_b[:, 2] * boxes_b[:, 3])[None] - inter
    return np.where(union > _EPS, inter / union, 0.0)


# ---------------------------------------------------------------------------
# vectorized jnp version (static shapes, VPU-friendly)
# ---------------------------------------------------------------------------

def _pairwise_intersection_area(corners_a: jnp.ndarray, corners_b: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two convex quads given corners (4, 2) each.

    Candidate points: 16 edge-pair intersections + 4 corners of A inside B + 4
    corners of B inside A = 24 fixed slots with a validity mask; valid points are
    sorted by angle around their centroid and the polygon area is the shoelace sum
    with invalid slots collapsed onto the first sorted vertex (zero-area segments).
    """
    # --- edge-pair intersections (16 candidates) ---
    a1 = corners_a  # (4,2)
    a2 = jnp.roll(corners_a, -1, axis=0)
    b1 = corners_b
    b2 = jnp.roll(corners_b, -1, axis=0)

    # broadcast all 4x4 edge pairs
    p = a1[:, None, :]              # (4,1,2)
    r = (a2 - a1)[:, None, :]       # (4,1,2)
    q = b1[None, :, :]              # (1,4,2)
    s = (b2 - b1)[None, :, :]       # (1,4,2)

    rxs = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]       # (4,4)
    qmp = q - p
    t_num = qmp[..., 0] * s[..., 1] - qmp[..., 1] * s[..., 0]
    u_num = qmp[..., 0] * r[..., 1] - qmp[..., 1] * r[..., 0]
    denom = jnp.where(jnp.abs(rxs) < _EPS, 1.0, rxs)
    t = t_num / denom
    u = u_num / denom
    valid_int = (jnp.abs(rxs) >= _EPS) & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)
    inter_pts = p + t[..., None] * r                           # (4,4,2)

    # --- containment candidates (4 + 4) ---
    def _inside(points, corners):
        # point-in-convex-CCW-quad via signed distance to every edge. The
        # tolerance is on the *distance* (cross / |edge|), not the raw cross
        # product, so it is scale-invariant — with f32 coords a raw-cross
        # epsilon of 1e-8 is below machine precision and rejects corners that
        # lie exactly on an edge (identical boxes then lose a corner and
        # self-IoU collapses to 1/3).
        e1 = corners                            # (4,2)
        e2 = jnp.roll(corners, -1, axis=0)
        d = e2 - e1                             # (4,2)
        v = points[:, None, :] - e1[None, :, :]  # (P,4,2)
        cross = d[None, :, 0] * v[..., 1] - d[None, :, 1] * v[..., 0]
        elen = jnp.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)[None, :]
        return jnp.all(cross >= -1e-4 * (elen + _EPS), axis=-1)

    # ensure CCW ordering (box_corners emits CCW for theta conventions, but make
    # it robust to reflected inputs by flipping when signed area is negative)
    def _force_ccw(c):
        x, y = c[:, 0], c[:, 1]
        signed = jnp.sum(x * jnp.roll(y, -1) - y * jnp.roll(x, -1))
        return jnp.where(signed >= 0, c, c[::-1])

    corners_a = _force_ccw(corners_a)
    corners_b = _force_ccw(corners_b)

    in_b = _inside(corners_a, corners_b)  # (4,)
    in_a = _inside(corners_b, corners_a)  # (4,)

    pts = jnp.concatenate([inter_pts.reshape(16, 2), corners_a, corners_b], axis=0)  # (24,2)
    valid = jnp.concatenate([valid_int.reshape(16), in_b, in_a], axis=0)             # (24,)

    num_valid = jnp.sum(valid)
    # centroid of valid points
    safe_count = jnp.maximum(num_valid, 1)
    centroid = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) / safe_count

    ang = jnp.arctan2(pts[:, 1] - centroid[1], pts[:, 0] - centroid[0])
    ang = jnp.where(valid, ang, jnp.inf)  # invalid slots sort last
    # variadic key-value sort instead of argsort + fancy gather: under the
    # vmap-over-pairs structure the gather lowers to serialized scatter/gather
    # on TPU (measured 1.26 s for 24x256x256 pairs); lax.sort is a bitonic
    # network over lanes and keeps everything on the VPU (~40x faster).
    # validity rides in the key itself (inf angle <=> invalid slot).
    sa, sx, sy = jax.lax.sort((ang, pts[:, 0], pts[:, 1]), num_keys=1)
    first_x, first_y = sx[0], sy[0]
    vmask = jnp.isfinite(sa)
    px = jnp.where(vmask, sx, first_x)
    py = jnp.where(vmask, sy, first_y)
    nx = jnp.roll(px, -1)
    ny = jnp.roll(py, -1)
    area = 0.5 * jnp.abs(jnp.sum(px * ny - py * nx))
    return jnp.where(num_valid >= 3, area, 0.0)


@jax.jit
def rotated_iou_pairs(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise rotated IoU between paired boxes (P, 5) x (P, 5) -> (P,).

    Used by anchor-target assignment (C7) where only candidate (anchor, gt) pairs
    near each other are evaluated instead of the full N x M matrix.
    """
    ca = box_corners(boxes_a).astype(jnp.float32)
    cb = box_corners(boxes_b).astype(jnp.float32)
    inter = jax.vmap(_pairwise_intersection_area)(ca, cb)
    union = boxes_a[:, 2] * boxes_a[:, 3] + boxes_b[:, 2] * boxes_b[:, 3] - inter
    return jnp.where(union > _EPS, inter / union, 0.0)


@jax.jit
def rotated_iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, M) rotated IoU between boxes (N, 5) and (M, 5), jit-compiled.

    Static-shape, loop-free: vmap over the pair grid; every pair costs a constant
    amount of VPU work. N*M pairs of ~100 flops — negligible next to the conv
    stack, and it keeps NMS entirely on device (north-star requirement).
    """
    ca = box_corners(boxes_a).astype(jnp.float32)  # (N,4,2)
    cb = box_corners(boxes_b).astype(jnp.float32)  # (M,4,2)
    inter = jax.vmap(
        lambda a: jax.vmap(lambda b: _pairwise_intersection_area(a, b))(cb)
    )(ca)  # (N,M)
    area_a = (boxes_a[:, 2] * boxes_a[:, 3])[:, None]
    area_b = (boxes_b[:, 2] * boxes_b[:, 3])[None, :]
    union = area_a + area_b - inter
    return jnp.where(union > _EPS, inter / union, 0.0)
