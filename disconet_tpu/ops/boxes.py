"""Anchors and rotated-box codec (SURVEY.md C7, reference coperception/utils/obj_util.py).

The reference generates 6 rotated anchors per BEV cell (``init_anchors_no_check``)
and encodes ground-truth boxes against them with a (dx, dy, dw, dl, sin, cos) code.
Here anchors are a trace-time constant (numpy), and encode/decode are pure jnp
functions that vectorize over arbitrary leading dims — no python loops on device.

Box parameterization everywhere in this framework:
    box = (cx, cy, w, l, theta)    # metric BEV coords, theta in radians
Corner order is CCW starting from the (+w/2, +l/2) corner in the box frame.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

from disconet_tpu.config import Config

Array = Union[np.ndarray, jnp.ndarray]


def make_anchors(config: Config) -> np.ndarray:
    """(H, W, A, 5) anchor boxes [cx, cy, w, l, theta] — a trace-time constant.

    Mirrors reference ``init_anchors_no_check`` (6 anchors per cell, sizes from
    config). Computed in numpy so XLA sees a constant, not a computation.
    """
    centers = config.anchor_centers()  # (H, W, 2)
    H, W, _ = centers.shape
    A = config.num_anchors
    sizes = np.asarray(config.anchor_sizes, dtype=np.float32)  # (A, 3) = (w, l, theta)
    anchors = np.zeros((H, W, A, 5), dtype=np.float32)
    anchors[..., 0:2] = centers[:, :, None, :]
    anchors[..., 2] = sizes[None, None, :, 0]
    anchors[..., 3] = sizes[None, None, :, 1]
    anchors[..., 4] = sizes[None, None, :, 2]
    return anchors


def _encode_impl(gt, anchors, xp):
    da = xp.sqrt(anchors[..., 2] ** 2 + anchors[..., 3] ** 2)
    dx = (gt[..., 0] - anchors[..., 0]) / da
    dy = (gt[..., 1] - anchors[..., 1]) / da
    dw = xp.log(gt[..., 2] / anchors[..., 2])
    dl = xp.log(gt[..., 3] / anchors[..., 3])
    s = xp.sin(gt[..., 4])
    c = xp.cos(gt[..., 4])
    return xp.stack([dx, dy, dw, dl, s, c], axis=-1)


def encode_boxes(gt: Array, anchors: Array) -> jnp.ndarray:
    """Encode gt boxes (..., 5) against anchors (..., 5) -> deltas (..., 6).

    Code (SECOND/FaF lineage, SURVEY.md C7):
        dx = (gx - ax) / d_a,  dy = (gy - ay) / d_a   with d_a = sqrt(aw^2 + al^2)
        dw = log(gw / aw),     dl = log(gl / al)
        s  = sin(g_theta),     c = cos(g_theta)       (absolute angle regression)
    """
    return _encode_impl(jnp.asarray(gt), jnp.asarray(anchors), jnp)


def encode_boxes_np(gt: np.ndarray, anchors: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`encode_boxes` for host-side data creation — keeps
    target assignment free of device dispatch (the TPU here sits behind a slow
    tunnel; data creation must never touch it)."""
    return _encode_impl(np.asarray(gt, np.float64), np.asarray(anchors, np.float64), np)


def decode_boxes(deltas: Array, anchors: Array) -> jnp.ndarray:
    """Inverse of :func:`encode_boxes`: deltas (..., 6) -> boxes (..., 5)."""
    deltas = jnp.asarray(deltas)
    anchors = jnp.asarray(anchors)
    da = jnp.sqrt(anchors[..., 2] ** 2 + anchors[..., 3] ** 2)
    cx = deltas[..., 0] * da + anchors[..., 0]
    cy = deltas[..., 1] * da + anchors[..., 1]
    w = jnp.exp(jnp.clip(deltas[..., 2], -10.0, 10.0)) * anchors[..., 2]
    l = jnp.exp(jnp.clip(deltas[..., 3], -10.0, 10.0)) * anchors[..., 3]
    theta = jnp.arctan2(deltas[..., 4], deltas[..., 5])
    return jnp.stack([cx, cy, w, l, theta], axis=-1)


def _corners_impl(boxes, xp):
    cx, cy, w, l, th = (boxes[..., i] for i in range(5))
    # Box-frame corner offsets, CCW from (+w/2, +l/2).
    dx = xp.stack([w / 2, -w / 2, -w / 2, w / 2], axis=-1)
    dy = xp.stack([l / 2, l / 2, -l / 2, -l / 2], axis=-1)
    c, s = xp.cos(th)[..., None], xp.sin(th)[..., None]
    x = cx[..., None] + c * dx - s * dy
    y = cy[..., None] + s * dx + c * dy
    return xp.stack([x, y], axis=-1)


def box_corners(boxes: Array) -> jnp.ndarray:
    """Boxes (..., 5) -> corners (..., 4, 2), jnp."""
    return _corners_impl(jnp.asarray(boxes), jnp)


def box_corners_np(boxes: np.ndarray) -> np.ndarray:
    """Numpy oracle of :func:`box_corners`."""
    return _corners_impl(np.asarray(boxes, dtype=np.float64), np)
