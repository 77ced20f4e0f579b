"""Anchor-target assignment (SURVEY.md C7, reference obj_util.py target assignment).

The reference assigns ground-truth boxes to the 6 rotated anchors of every BEV cell
by BEV IoU inside numpy loops at data-creation time. Here the assignment is
vectorized: only (anchor, gt) pairs whose centers are within a conservative radius
are evaluated (exact rotated IoU via :func:`rotated_iou_pairs`), which is both the
correctness-preserving pruning (IoU of farther pairs is exactly 0) and what keeps
cost ~O(G * window) instead of O(H*W*A*G).

Assignment rule (FaF/MotionNet lineage, tier-[B]):
  * an anchor is positive if its best-gt IoU >= pos_iou_threshold;
  * additionally, every gt's single best anchor is forced positive so no gt is
    unmatched;
  * positives get ``label_one_hot = [0, 1]`` (vehicle) and ``reg_target`` =
    encode(best gt, anchor); everything else is background ``[1, 0]``;
  * ``reg_loss_mask`` marks positives (the reg loss is masked, SURVEY.md C9).

This runs on host at data-creation time and is pure numpy end to end (vectorized
rotated IoU + encode) — no device dispatch in the data path.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from disconet_tpu.config import Config
from disconet_tpu.ops.boxes import encode_boxes_np, make_anchors
from disconet_tpu.ops.rotated_iou import rotated_iou_pairs_np


def assign_targets(
    gt_boxes: np.ndarray,
    config: Config,
    anchors: np.ndarray | None = None,
    gt_classes: np.ndarray | None = None,
) -> Dict[str, np.ndarray]:
    """Assign gt boxes (G, 5) to anchors -> detection training targets.

    ``gt_classes`` (G,) int class ids in 1..num_classes-1 routes each positive
    anchor's one-hot to its gt's class column (multi-class det, SURVEY.md
    C20/§4.2); omitted = every gt is class 1 (the reference's binary vehicle
    task).

    Returns dict with keys label_one_hot (H,W,A,C), reg_target (H,W,A,6),
    reg_loss_mask (H,W,A) bool, gt_max_iou (G,2), anchors_map (H,W,A,6).
    """
    if anchors is None:
        anchors = make_anchors(config)  # (H, W, A, 5)
    H, W, A, _ = anchors.shape
    C = config.num_classes
    gt_boxes = np.asarray(gt_boxes, dtype=np.float32).reshape(-1, 5)
    G = len(gt_boxes)

    flat_anchors = anchors.reshape(-1, 5)
    n_anchors = flat_anchors.shape[0]

    label = np.zeros((n_anchors, C), dtype=np.float32)
    label[:, 0] = 1.0  # background
    reg_target = np.zeros((n_anchors, config.box_code_size), dtype=np.float32)
    reg_mask = np.zeros((n_anchors,), dtype=bool)
    gt_max_iou = np.zeros((G, 2), dtype=np.float32)

    if G > 0:
        centers = flat_anchors[:, :2]
        anchor_rad = 0.5 * np.hypot(flat_anchors[:, 2], flat_anchors[:, 3])
        gt_rad = 0.5 * np.hypot(gt_boxes[:, 2], gt_boxes[:, 3])

        best_iou = np.zeros((n_anchors,), dtype=np.float32)
        best_gt = np.full((n_anchors,), -1, dtype=np.int64)

        # phase 1: regular best-gt-per-anchor assignment (+ per-gt candidates
        # kept for phase 2)
        cand_per_gt = []
        for g in range(G):
            # exact pruning: boxes whose center distance exceeds the sum of
            # circumscribed radii cannot intersect
            d = np.hypot(centers[:, 0] - gt_boxes[g, 0], centers[:, 1] - gt_boxes[g, 1])
            cand = np.nonzero(d <= anchor_rad + gt_rad[g])[0]
            if cand.size == 0:
                # degenerate: fall back to the nearest anchor (IoU 0)
                cand = np.array([int(np.argmin(d))])
            ious = rotated_iou_pairs_np(
                flat_anchors[cand], np.broadcast_to(gt_boxes[g], (cand.size, 5))
            )
            upd = ious > best_iou[cand]
            best_iou[cand[upd]] = ious[upd]
            best_gt[cand[upd]] = g
            k = cand[int(np.argmax(ious))]
            gt_max_iou[g] = (float(ious.max()), float(k))
            cand_per_gt.append((cand, ious))

        # phase 2: force-match AFTER all regular updates — doing it inside the
        # loop let a later gt silently revoke an earlier gt's forced anchor
        # (overwriting best_gt at the shared anchor), leaving that gt with zero
        # positives. Greedy over each gt's candidates, skipping anchors already
        # force-claimed, so every gt keeps its own positive anchor whenever one
        # is available (conflicts only if a gt's every candidate is claimed —
        # then the best one is shared, the unavoidable case).
        force_claimed: Dict[int, int] = {}
        for g in range(G):
            cand, ious = cand_per_gt[g]
            pick = -1
            for o in np.argsort(-ious):
                if int(cand[o]) not in force_claimed:
                    pick = int(cand[o])
                    break
            if pick < 0:
                pick = int(cand[int(np.argmax(ious))])
            force_claimed.setdefault(pick, g)
            best_gt[pick] = g
            reg_mask[pick] = True

        pos = (best_iou >= config.pos_iou_threshold) & (best_gt >= 0)
        reg_mask |= pos
        # nonzero of a mask -> strictly increasing, hence UNIQUE, sites:
        # packed_det_losses' sparse correction requires uniqueness (its
        # docstring contract) — a duplicate would double-count there
        pos_idx = np.nonzero(reg_mask)[0]
        if pos_idx.size:
            matched = gt_boxes[best_gt[pos_idx]]
            reg_target[pos_idx] = encode_boxes_np(matched, flat_anchors[pos_idx]).astype(
                np.float32
            )
            if gt_classes is None:
                cls_col = np.ones(pos_idx.size, dtype=np.int64)
            else:
                cls_col = np.asarray(gt_classes, np.int64).reshape(-1)[best_gt[pos_idx]]
                if cls_col.min(initial=1) < 1 or cls_col.max(initial=1) >= C:
                    raise ValueError(
                        f"gt_classes must be in [1, {C - 1}] for num_classes={C}"
                    )
            label[pos_idx, 0] = 0.0
            label[pos_idx, cls_col] = 1.0

    anchors_map6 = np.concatenate(
        [
            anchors[..., 0:4],
            np.sin(anchors[..., 4:5]),
            np.cos(anchors[..., 4:5]),
        ],
        axis=-1,
    ).astype(np.float32)

    return {
        "label_one_hot": label.reshape(H, W, A, C),
        "reg_target": reg_target.reshape(H, W, A, config.box_code_size),
        "reg_loss_mask": reg_mask.reshape(H, W, A),
        "gt_max_iou": gt_max_iou,
        "anchors_map": anchors_map6,
    }


def anchors_from_map(anchors_map: np.ndarray) -> np.ndarray:
    """(H, W, A, 6) stored (cx, cy, w, l, sin, cos) -> (H, W, A, 5) with theta."""
    theta = np.arctan2(anchors_map[..., 4], anchors_map[..., 5])
    return np.concatenate([anchors_map[..., :4], theta[..., None]], axis=-1)
