"""Rotated-box BEV IoU (SURVEY.md C8, reference coperception/utils/detection_util.py).

The reference computes rotated-rectangle IoU on the host with shapely-style convex
polygon clipping (``polygon_clip`` / ``convex_hull_intersection`` lineage), one pair
at a time inside python loops. Here:

* :func:`rotated_iou_np` — exact numpy oracle (Sutherland–Hodgman + shoelace),
  used for host-side mAP matching and as the parity reference in tests.
* :func:`rotated_iou_pairs_np` / :func:`rotated_iou_matrix_np` — vectorized
  numpy (candidate-point formulation) for host paths: target assignment, mAP
  matching, SORT association.
* :func:`rotated_iou_matrix` / :func:`rotated_iou_pairs` — jnp, static shapes,
  pair axis on VPU lanes. Intersection areas come from the Liang-Barsky
  boundary-piece decomposition (:func:`_clip_pieces_area`): the closed
  boundary of A.intersect.B is exactly the clipped pieces of A's edges inside B plus
  B's edges inside A, so the shoelace area needs NO vertex sorting — purely
  elementwise VPU work (the earlier angle-sort formulation's bitonic passes
  were the on-device NMS hot spot: 107 -> 7 ms for 6.3M pairs on v5e).
  Accuracy is bounded by the deliberate scale-aware boundary tolerance
  (~1e-4 relative IoU; thresholds at 0.01/0.5/0.7 are unaffected).
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

def _clip_pieces_area(P: jnp.ndarray, C: jnp.ndarray, boundary_tol: jnp.ndarray) -> jnp.ndarray:
    """Sum of shoelace contributions of P's edge pieces inside convex quad C.

    Lanes layout: P, C are (4, 2, N) CCW corner arrays. Each edge segment of P
    is clipped against C's 4 half-planes (Liang-Barsky t-interval); a surviving
    sub-segment [q1, q2] contributes 0.5*cross(q1, q2). The closed boundary of
    A.intersect.B is exactly the union of A-edge pieces inside B and B-edge
    pieces inside A (traversed CCW), so summing both gives the shoelace area
    with NO vertex sorting — the angle-sort formulation's bitonic passes over
    (24, N) candidate tensors were the NMS hot spot (~107 ms for 6.3M pairs).

    ``boundary_tol`` (per-lane, scale-aware): pieces lying exactly ON C's
    boundary are included when positive and excluded when negative — callers
    pass +tol for the A-in-B pass and -tol for B-in-A so coincident edges
    (identical boxes) are counted exactly once.
    """
    e1 = P  # (4, 2, N)
    e2 = jnp.roll(P, -1, axis=0)
    d = e2 - e1  # segment directions
    # C's inward half-planes: edge c1->c2 (CCW), inward normal = (-dy, dx)
    c1 = C
    cd = jnp.roll(C, -1, axis=0) - C
    nx = -cd[:, 1]  # (4, N)
    ny = cd[:, 0]

    # f_k(t) = num + t * den >= -tol  must hold for all 4 planes k
    # num[e, k] = n_k . (e1_e - c1_k), den[e, k] = n_k . d_e
    num = (
        nx[None] * (e1[:, None, 0] - c1[None, :, 0])
        + ny[None] * (e1[:, None, 1] - c1[None, :, 1])
    )  # (4 edges, 4 planes, N)
    den = nx[None] * d[:, None, 0] + ny[None] * d[:, None, 1]

    nlen = jnp.sqrt(nx * nx + ny * ny)[None]
    dlen = jnp.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)[:, None]
    tol = boundary_tol[None, None] * nlen  # scale by |n|
    # scale-aware parallel test (see the pallas twin): exactly-parallel edges
    # leave an FMA-ordering-dependent f32 residue in den
    is_par = jnp.abs(den) < 1e-5 * nlen * dlen + 1e-9
    t_cross = -(num + tol) / jnp.where(is_par, 1.0, den)
    # den > 0: f increasing -> t >= t_cross (lower bound); den < 0: t <= t_cross
    lo_k = jnp.where(~is_par & (den > 0), t_cross, 0.0)
    hi_k = jnp.where(~is_par & (den < 0), t_cross, 1.0)
    t_lo = jnp.maximum(jnp.max(lo_k, axis=1), 0.0)  # (4, N)
    t_hi = jnp.minimum(jnp.min(hi_k, axis=1), 1.0)
    # parallel plane with the segment strictly outside kills the segment
    par_ok = jnp.all(~is_par | (num >= -tol), axis=1)  # (4, N)
    alive = (t_hi > t_lo) & par_ok

    q1x = e1[:, 0] + t_lo * d[:, 0]
    q1y = e1[:, 1] + t_lo * d[:, 1]
    q2x = e1[:, 0] + t_hi * d[:, 0]
    q2y = e1[:, 1] + t_hi * d[:, 1]
    contrib = 0.5 * (q1x * q2y - q1y * q2x)
    return jnp.sum(jnp.where(alive, contrib, 0.0), axis=0)  # (N,)


def _intersection_area_lb(ca: jnp.ndarray, cb: jnp.ndarray) -> jnp.ndarray:
    """Liang-Barsky intersection area over (4, 2, N) CCW corner arrays."""
    # scale-aware boundary tolerance from typical coordinate magnitude
    scale = jnp.maximum(
        jnp.max(jnp.abs(ca), axis=(0, 1)), jnp.max(jnp.abs(cb), axis=(0, 1))
    ) + 1.0
    tol = 1e-5 * scale  # (N,)

    def force_ccw(c):
        x, y = c[:, 0], c[:, 1]
        signed = jnp.sum(x * jnp.roll(y, -1, axis=0) - y * jnp.roll(x, -1, axis=0), axis=0)
        return jnp.where(signed[None, None] >= 0, c, c[::-1])

    ca = force_ccw(ca)
    cb = force_ccw(cb)
    # shoelace of pieces is signed and origin-dependent; the two passes share
    # the origin so the closed-boundary sum is the true area. inclusive tol on
    # the A-pass, exclusive on the B-pass => coincident edges counted once.
    area = _clip_pieces_area(ca, cb, tol) + _clip_pieces_area(cb, ca, -tol)
    return jnp.maximum(area, 0.0)


@jax.jit
def rotated_iou_pairs(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise rotated IoU between paired boxes (P, 5) x (P, 5) -> (P,).

    Used by anchor-target assignment (C7) where only candidate (anchor, gt) pairs
    near each other are evaluated instead of the full N x M matrix.
    """
    ca = jnp.moveaxis(box_corners(boxes_a).astype(jnp.float32), 0, -1)  # (4,2,P)
    cb = jnp.moveaxis(box_corners(boxes_b).astype(jnp.float32), 0, -1)
    inter = _intersection_area_lb(ca, cb)
    union = boxes_a[:, 2] * boxes_a[:, 3] + boxes_b[:, 2] * boxes_b[:, 3] - inter
    return jnp.where(union > _EPS, inter / union, 0.0)


@jax.jit
def rotated_iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, M) rotated IoU between boxes (N, 5) and (M, 5), jit-compiled.

    Static-shape, loop-free, pair axis on VPU lanes, Liang-Barsky boundary
    pieces (no sort/gather; see :func:`_clip_pieces_area`) — keeps NMS
    entirely on device (north-star requirement).
    """
    N, M = boxes_a.shape[0], boxes_b.shape[0]
    ca = box_corners(boxes_a).astype(jnp.float32)  # (N,4,2)
    cb = box_corners(boxes_b).astype(jnp.float32)  # (M,4,2)
    ca_l = jnp.broadcast_to(
        jnp.moveaxis(ca, 0, -1)[:, :, :, None], (4, 2, N, M)
    ).reshape(4, 2, N * M)
    cb_l = jnp.broadcast_to(
        jnp.moveaxis(cb, 0, -1)[:, :, None, :], (4, 2, N, M)
    ).reshape(4, 2, N * M)
    inter = _intersection_area_lb(ca_l, cb_l).reshape(N, M)
    area_a = (boxes_a[:, 2] * boxes_a[:, 3])[:, None]
    area_b = (boxes_b[:, 2] * boxes_b[:, 3])[None, :]
    union = area_a + area_b - inter
    return jnp.where(union > _EPS, inter / union, 0.0)
