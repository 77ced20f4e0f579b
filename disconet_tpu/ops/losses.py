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
