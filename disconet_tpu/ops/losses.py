"""Losses (SURVEY.md C9, reference coperception/utils/loss.py).

``SoftmaxFocalClassificationLoss`` (gamma=2, softmax-focal over one-hot targets)
and ``WeightedSmoothL1LocalizationLoss`` (sigma~=3, masked by ``reg_loss_mask``),
plus the KD per-pixel feature-matching MSE (SURVEY.md C20, kd_weight * MSE between
student and teacher decoder features). All pure jnp functions, fp32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_focal_loss(
    logits: jnp.ndarray,
    one_hot: jnp.ndarray,
    gamma: float = 2.0,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Softmax focal loss, mean over (optionally masked) elements.

    Args:
        logits: (..., C) raw class logits.
        one_hot: (..., C) one-hot targets.
        gamma: focusing parameter (reference default 2).
        mask: optional (...,) validity weights (e.g. padded-agent mask).
    """
    logits = logits.astype(jnp.float32)
    one_hot = one_hot.astype(jnp.float32)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(log_p)
    focal = -one_hot * ((1.0 - p) ** gamma) * log_p  # (..., C)
    per_elem = jnp.sum(focal, axis=-1)
    if mask is not None:
        per_elem = per_elem * mask
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        return jnp.sum(per_elem) / denom
    return jnp.mean(per_elem)


def weighted_smooth_l1(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    sigma: float = 3.0,
) -> jnp.ndarray:
    """Masked smooth-L1 (Huber) regression loss.

    loss = 0.5*(sigma*d)^2        if |d| < 1/sigma^2
         = |d| - 0.5/sigma^2      otherwise
    Mean over elements where ``mask`` is nonzero.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    d = pred - target
    abs_d = jnp.abs(d)
    s2 = sigma * sigma
    loss = jnp.where(abs_d < 1.0 / s2, 0.5 * s2 * d * d, abs_d - 0.5 / s2)
    mask = jnp.broadcast_to(mask, loss.shape).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(loss * mask) / denom


def packed_det_losses(
    raw: jnp.ndarray,
    pos_idx: jnp.ndarray,
    pos_target: jnp.ndarray,
    agent_mask: jnp.ndarray,
    *,
    num_anchors: int,
    num_classes: int,
    box_code_size: int,
    pos_cls: jnp.ndarray | None = None,
    gamma: float = 2.0,
    sigma: float = 3.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Focal cls + masked smooth-L1 reg computed straight from the PACKED
    head tensor — numerically equal to ``softmax_focal_loss`` /
    ``weighted_smooth_l1`` over the logical (B,A,H,W,NA,·) views (tested in
    tests/test_packed_loss.py) but never materializing them.

    Why: on TPU a tensor whose trailing dims are (NA=6, NC=2) is tiled to
    (8, 128) sublanes x lanes — an up-to-85x physical HBM inflation. The
    view-based loss path materialized several such tensors fwd+bwd, making
    heads+loss 49% of the training step at ~46 GB of traffic
    (docs/performance.md, train-step roofline). Strategy here:

      * one dense fused pass over ``raw``'s cls lanes computes the focal
        term under the assumption every anchor is background (lane slices +
        elementwise + reduce fuse into a single read of ``raw``);
      * a sparse correction replaces background terms with positive-class
        terms at the listed positive sites only — the target encoding
        (``reg_pos_idx``) is already sparse, so no dense one-hot scatter
        and no (B,A,H,W,NA,C) label tensor exist at all;
      * reg predictions are gathered per positive site from ``raw``'s reg
        lanes (anchor-major), so the (B,A,H*W*NA,code) view the old gather
        needed (code=6 in the lane dim -> 21x padding) also disappears.

    Layout contract (models/backbone.py DetectionHeads): lane ``c*NA + a``
    holds class-``c`` logits of anchor ``a`` (class-major); lane
    ``NA*NC + a*code + j`` holds reg code ``j`` of anchor ``a``. Flat site
    index = ``(h*W + w)*NA + a`` with sentinel ``H*W*NA`` for padding.
    Valid entries of ``pos_idx`` MUST be unique per (b, a): the sparse
    correction SUMS per-site terms, so a duplicated site double-counts,
    whereas the view path's ``.at[].set`` scatter is idempotent to
    duplicates. The dataset encoder satisfies this by construction —
    ``np.nonzero`` of a site mask (data/targets.py) yields strictly
    increasing indices — but any new target source must keep the contract.

    Args:
        raw: (B, A, H, W, NA*NC + NA*code) packed head output, fp32.
        pos_idx: (B, A, P) int flat positive-anchor sites (sentinel = n_flat).
        pos_target: (B, A, P, code) reg deltas at those sites.
        agent_mask: (B, A) validity of agent slots.
        pos_cls: (B, A, P) int class id of each positive (multi-class);
            ``None`` = binary (class 1).
    Returns:
        (cls_loss, reg_loss) scalars, fp32.
    """
    B, A, H, W, L = raw.shape
    NA, NC, code = num_anchors, num_classes, box_code_size
    assert L == NA * NC + NA * code, (L, NA, NC, code)
    raw = raw.astype(jnp.float32)
    am = agent_mask.astype(jnp.float32)

    def focal(logp):  # the view path's -(1-p)^gamma * log p, same expression
        return -((1.0 - jnp.exp(logp)) ** gamma) * logp

    # ---- dense background pass: ONE fused read of raw's cls lanes ----
    ls = [raw[..., c * NA : (c + 1) * NA] for c in range(NC)]  # (B,A,H,W,NA) each
    m = ls[0]
    for l in ls[1:]:
        m = jnp.maximum(m, l)
    lse = m + jnp.log(sum(jnp.exp(l - m) for l in ls))
    neg = focal(ls[0] - lse)  # background (class 0) term per anchor
    dense_sum = jnp.sum(jnp.sum(neg, axis=(2, 3, 4)) * am)
    denom_cls = jnp.maximum(jnp.sum(am) * (H * W * NA), 1.0)

    # ---- sparse sites: gather each positive's packed row once ----
    n_flat = H * W * NA
    idx = pos_idx.astype(jnp.int32)
    valid = (idx < n_flat).astype(jnp.float32) * am[:, :, None]  # (B,A,P)
    safe = jnp.minimum(idx, n_flat - 1)
    pix, a_id = safe // NA, safe % NA
    rows = jnp.take_along_axis(  # (B,A,P,L)
        raw.reshape(B, A, H * W, L), pix[..., None], axis=2
    )
    cls_lanes = a_id[..., None] + jnp.arange(NC, dtype=jnp.int32) * NA
    site_logits = jnp.take_along_axis(rows, cls_lanes, axis=-1)  # (B,A,P,NC)
    site_logp = jax.nn.log_softmax(site_logits, axis=-1)
    y = pos_cls.astype(jnp.int32) if pos_cls is not None else jnp.ones_like(safe)
    logp_y = jnp.take_along_axis(site_logp, y[..., None], axis=-1)[..., 0]
    corr = jnp.sum((focal(logp_y) - focal(site_logp[..., 0])) * valid)
    cls_loss = (dense_sum + corr) / denom_cls

    # ---- reg smooth-L1 at the positive sites ----
    reg_lanes = NA * NC + a_id[..., None] * code + jnp.arange(code, dtype=jnp.int32)
    pred_pos = jnp.take_along_axis(rows, reg_lanes, axis=-1)  # (B,A,P,code)
    reg_loss = weighted_smooth_l1(pred_pos, pos_target, valid[..., None], sigma=sigma)
    return cls_loss, reg_loss


def kd_feature_loss(
    student_feats: jnp.ndarray,
    teacher_feats: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-pixel MSE between student and teacher feature maps (SURVEY.md §4.3).

    Teacher features should already be stop-gradient'ed by the caller. ``mask``
    (broadcastable to the leading dims) removes padded agents so distillation never
    matches against garbage teacher slots.
    """
    d = student_feats.astype(jnp.float32) - teacher_feats.astype(jnp.float32)
    sq = d * d
    if mask is not None:
        mask = jnp.reshape(mask, mask.shape + (1,) * (sq.ndim - mask.ndim)).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(mask) * (sq.size / max(mask.size, 1)), 1.0)
        return jnp.sum(sq * mask) / denom
    return jnp.mean(sq)
