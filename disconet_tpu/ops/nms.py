"""On-device rotated NMS (SURVEY.md C8 rebuild note).

The reference runs per-class rotated NMS on the host with shapely polygon IoU
inside python loops (coperception/utils/detection_util.py ``non_max_suppression``)
— the eval hot spot (SURVEY.md §4.2). Here NMS stays on device and jittable:

1. top-K boxes by score (static K),
2. one (K, K) rotated-IoU matrix (vectorized, see rotated_iou.py),
3. greedy suppression as a sequential scan over K rows with a keep mask
   (lax.fori_loop — K is static, the loop body is pure VPU masking).

Returns fixed-size outputs (boxes, scores, keep-mask); downstream host code
filters by the mask. This keeps everything static-shape under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from disconet_tpu.ops.boxes import decode_boxes
from disconet_tpu.ops.rotated_iou import rotated_iou_matrix


def foreground_scores(cls_logits: jnp.ndarray) -> jnp.ndarray:
    """Per-anchor foreground probability from raw class logits, fp32.

    For the reference's binary vehicle class (SURVEY.md C1) the 2-way softmax
    probability of class 1 is exactly ``sigmoid(l1 - l0)`` — one fused
    elementwise pass instead of materializing the full softmax tensor. For
    more classes (class 0 = background, as in the reference's one-hot layout)
    foreground is ``1 - p(background)``, so anchors confident in *any* object
    class rank as candidates; class attribution for multi-class NMS would go
    on top (the shipped configs are binary, SURVEY.md C1).
    """
    cls_logits = cls_logits.astype(jnp.float32)
    if cls_logits.shape[-1] == 2:
        return jax.nn.sigmoid(cls_logits[..., 1] - cls_logits[..., 0])
    return 1.0 - jax.nn.softmax(cls_logits, axis=-1)[..., 0]


def packed_scores_and_deltas(raw: jnp.ndarray, num_anchors: int, box_code_size: int = 6):
    """Split a DetectionHeads raw packed tensor into (scores, packed deltas).

    ``raw`` is (..., NA*2 + NA*code) in the class-major layout emitted by
    models/backbone.py DetectionHeads (binary class): cls block = [all class-0
    | all class-1] over anchors, then the anchor-major reg block. Foreground
    score = sigmoid(l1 - l0) over two contiguous lane slices; deltas stay
    packed for :func:`rotated_nms_decode`'s winner-only per-anchor split.
    This is THE coupling point to the head layout — keep all consumers here.
    """
    NA = num_anchors
    if raw.shape[-1] != NA * (2 + box_code_size):
        raise ValueError(
            f"packed head tensor has {raw.shape[-1]} channels, expected "
            f"NA*(2 + {box_code_size}) = {NA * (2 + box_code_size)} — this "
            "helper assumes the binary-class layout (guard on "
            "config.num_classes == 2 before calling)"
        )
    scores = jax.nn.sigmoid(
        raw[..., NA : 2 * NA].astype(jnp.float32) - raw[..., :NA].astype(jnp.float32)
    )
    return scores, raw[..., 2 * NA :]


def _select_candidates(scores, score_threshold, top_k, exact_top_k):
    """Static top-k candidate indices + thresholded scores (padded to top_k)."""
    n = scores.shape[0]
    k = min(top_k, n)
    scores = jnp.where(scores >= score_threshold, scores, -1.0)
    if exact_top_k or n <= top_k:
        top_scores, idx = jax.lax.top_k(scores, k)
    else:
        top_scores, idx = jax.lax.approx_max_k(scores, k, recall_target=0.99)
    return top_scores, idx, k


def _top_cells(cell_max, top_k, exact_top_k):
    """Level-1 cell selection: top-k over (H*W,) cell maxima (exact/approx)."""
    k = min(top_k, cell_max.shape[0])
    if exact_top_k or cell_max.shape[0] <= top_k:
        _, cells = jax.lax.top_k(cell_max, k)
    else:
        _, cells = jax.lax.approx_max_k(cell_max, k, recall_target=0.99)
    return cells


def _select_candidates_spatial(scores, score_threshold, top_k, exact_top_k):
    """Two-level top-k over (H, W, A) scores without flattening the tensor.

    Flattening (H, W, A) -> (N,) forces a tiled-layout relayout on TPU and a
    top-k over the full N ≈ 400k anchors (measured 16 ms/96 frames at the
    reference geometry). Instead: (1) max over the anchor axis — a minor-dim
    lane reduction; (2) top-k over the H*W cell maxima (6x less data, and the
    (H, W) flatten of a rank-2 result is cheap); (3) exact top-k over the
    winners' K*A individual scores. Level 2+3 are *exact* w.r.t. level-1
    selection: if score s ranks in the global top-K, fewer than K cells can
    have a maximum above s, so s's cell survives level 2.

    Returns (top_scores, (h, w, a) index vectors) padded to top_k.
    """
    H, W, A = scores.shape
    cells = _top_cells(jnp.max(scores, axis=-1).reshape(-1), top_k, exact_top_k)
    cand = scores[cells // W, cells % W]  # (k, A) gather, natural layout
    kk = min(top_k, cand.size)
    vals, pos = jax.lax.top_k(cand.reshape(-1), kk)
    cell_sel = cells[pos // A]
    h = cell_sel // W
    w = cell_sel % W
    a = pos % A
    vals = jnp.where(vals >= score_threshold, vals, -1.0)
    vals = _pad_to(vals, top_k, -1.0)
    h = _pad_to(h, top_k, 0)
    w = _pad_to(w, top_k, 0)
    a = _pad_to(a, top_k, 0)
    return vals, (h, w, a)


def _cell_max_logit_diff(raw: jnp.ndarray, num_anchors: int) -> jnp.ndarray:
    """Per-cell max over anchors of the foreground-vs-background logit diff,
    computed with full-register-width lane ops on the packed head tensor.

    ``diff[a] = raw[..., NA+a] - raw[..., a]`` for ``a < NA`` (class-major cls
    block, see models/backbone.py DetectionHeads). Slicing those lanes out
    materializes (H, W, NA) intermediates whose minor dim (NA=6 at the
    reference geometry) occupies 6 of the 128 TPU lanes — every elementwise
    and reduce op over them runs at ~5% lane utilization, which is why the
    first packed-selection attempt measured *slower* than the dense-score
    path. Rolling the lane axis by -NA instead aligns every class-1 logit
    over its class-0 partner at full register width, so the subtract, the
    lane mask and the minor-dim max all run on the native 48-lane layout and
    fuse into ONE pass over ``raw`` (no (H, W, NA) tensor exists at all).
    Lanes >= NA of the rolled difference are garbage (reg-block wraparound)
    and masked to -inf before the reduce.
    """
    r = raw.astype(jnp.float32)
    d = jnp.roll(r, -num_anchors, axis=-1) - r
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    return jnp.max(jnp.where(lane < num_anchors, d, -jnp.inf), axis=-1)


def _pad_to(x, top_k, fill):
    pad = top_k - x.shape[0]
    if pad <= 0:
        return x
    pad_block = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x, pad_block], axis=0)


def _mask_invalid_boxes(top_boxes, top_scores):
    """Zero box rows whose slot is dead (below threshold or padding).

    Keeps every NMS entry point's output contract identical — dead slots carry
    (0,0,0,0,0) instead of whatever geometry the index padding happened to
    decode — so variants are comparable array-for-array at any grid size and
    no consumer can accidentally read garbage boxes past the keep mask.
    """
    return jnp.where((top_scores > -1.0)[:, None], top_boxes, 0.0)


def _iou_matrix(top_boxes):
    """(K, K) rotated IoU of the candidate set against itself."""
    # a (cx, cy, w, l, θ) box is the same point set under w -> |w| (symmetric
    # extents), but every IoU implementation here assumes w,l >= 0 (signed
    # areas / Liang-Barsky normals break otherwise). Decoded boxes guarantee
    # it (exp-coded sizes); rotated_nms accepts arbitrary caller boxes, so
    # normalize once (K x 2 values, free) instead of trusting callers.
    b = top_boxes.at[:, 2:4].set(jnp.abs(top_boxes[:, 2:4]))
    if jax.default_backend() == "tpu":
        # Pallas kernel: whole clip pipeline in VMEM tiles, 3.7x the XLA
        # version (9.4 vs 35 ms for 96x256x256 pairs on v5e)
        from disconet_tpu.ops.pallas.rotated_iou_pallas import rotated_iou_matrix_pallas

        return rotated_iou_matrix_pallas(b, b)
    return rotated_iou_matrix(b, b)  # (K, K)


def _suppress_sequential(top_boxes, top_scores, iou_threshold, top_k):
    """Greedy suppression as the literal K-step sequential scan (oracle).

    The textbook formulation: row i, if still alive, kills every later row
    overlapping it. K sequential fori_loop steps of tiny VPU masking — each
    step is latency- not throughput-bound on TPU, which is why the fixpoint
    version below replaced it on the hot path (measured equal keep masks by
    construction; see test_ops.py::test_suppress_fixpoint_matches_sequential).
    """
    iou = _iou_matrix(top_boxes)
    valid = top_scores > -1.0

    def body(i, keep):
        # row i is kept iff still alive; if kept, suppress later overlapping rows
        row_kept = keep[i] & valid[i]
        suppress = (iou[i] > iou_threshold) & (jnp.arange(top_k) > i) & row_kept
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, top_k, body, valid)
    return keep & valid


def _suppress(top_boxes, top_scores, iou_threshold, top_k):
    """Greedy suppression via exact fixpoint iteration (shared NMS tail).

    Greedy NMS is the unique solution of the prefix recurrence
    ``keep[i] = valid[i] and not any(j < i: keep[j] and iou[j, i] > thr)``.
    Iterating ``keep <- f(keep)`` from ``keep = valid`` settles at least one
    more prefix index per step (if keep matches the solution on [0, m), the
    update of index m reads only settled rows, so [0, m] is settled next), so
    a while_loop until no element changes is EXACT, and terminates in
    (suppression-chain depth + 1) iterations — a handful in practice vs the
    K=256 sequential steps of :func:`_suppress_sequential`, whose per-step
    cost is pure loop latency. Each iteration is one (K, K) masked any-reduce,
    which vectorizes over the vmapped frame axis. Measured on v5e at the
    production shape (96 frames x K=256, Pallas IoU matrix included in both):
    5.11 vs 5.27 ms — the IoU matrix dominates this stage, so the e2e win is
    small; the formulation mainly buys K-independent scaling for larger
    candidate budgets.
    """
    iou = _iou_matrix(top_boxes)
    valid = top_scores > -1.0
    i_lt_j = jnp.arange(top_k)[:, None] < jnp.arange(top_k)[None, :]
    conflict = (iou > iou_threshold) & i_lt_j  # [j, i]: kept j would kill i>j

    def cond(carry):
        keep, changed, it = carry
        return changed & (it < top_k)

    def body(carry):
        keep, _, it = carry
        new = valid & ~jnp.any(keep[:, None] & conflict, axis=0)
        return new, jnp.any(new != keep), it + 1

    keep, _, _ = jax.lax.while_loop(cond, body, (valid, jnp.bool_(True), 0))
    return keep


@functools.partial(jax.jit, static_argnames=("top_k", "exact_top_k"))
def rotated_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    score_threshold: float = 0.0,
    top_k: int = 256,
    exact_top_k: bool = False,
):
    """Greedy rotated NMS with static shapes.

    Args:
        boxes: (N, 5) rotated boxes (cx, cy, w, l, theta).
        scores: (N,) confidence scores. Must live strictly above -1.0
            (probability-like domains do): -1.0 is the internal dead-slot
            sentinel, so scores at or below it would corrupt ranking and the
            keep mask. Pass raw logits through a sigmoid/softmax first.
        iou_threshold: suppress boxes with IoU > threshold against a kept box.
        score_threshold: boxes below this are dropped up front.
        top_k: static number of candidates considered (and size of the output).
        exact_top_k: use exact ``lax.top_k`` for candidate selection instead of
            the TPU-native ``lax.approx_max_k`` (recall target 0.99 of the
            K highest scores over ~400k anchors; the handful of detections
            above the score threshold are far from the recall boundary, so
            eval metrics are unaffected — flip this on for strict parity runs).

    Returns:
        (boxes_k, scores_k, keep): (top_k, 5), (top_k,), (top_k,) bool. Slots that
        were suppressed / below threshold / padding have keep=False and score=-1.
    """
    top_scores, idx, _ = _select_candidates(scores, score_threshold, top_k, exact_top_k)
    top_boxes = _pad_to(boxes[idx], top_k, 0.0)
    top_scores = _pad_to(top_scores, top_k, -1.0)
    top_boxes = _mask_invalid_boxes(top_boxes, top_scores)
    keep = _suppress(top_boxes, top_scores, iou_threshold, top_k)
    return top_boxes, top_scores, keep


@functools.partial(jax.jit, static_argnames=("num_anchors", "top_k", "exact_top_k"))
def rotated_nms_decode_packed(
    raw: jnp.ndarray,
    anchors: jnp.ndarray,
    num_anchors: int,
    iou_threshold: float,
    score_threshold: float = 0.0,
    top_k: int = 256,
    exact_top_k: bool = False,
):
    """Rotated NMS straight from the packed head output (fastest predict path).

    ``raw`` is the (H, W, 2*NA + NA*code) class-major head tensor (see
    :func:`packed_scores_and_deltas`). Because sigmoid is monotonic, candidate
    selection runs directly on the raw logit differences and only the K
    winners are ever sigmoided — the (H, W, NA) foreground-score tensor of the
    other paths is never materialized. Selection, thresholding, decode and
    suppression match :func:`rotated_nms_decode` on
    ``packed_scores_and_deltas(raw)`` (unit-tested equal), with one caveat:
    candidates here are ranked in the logit domain, so where f32 ``sigmoid``
    saturates (|logit diff| > ~17) the score-domain path sees exact 1.0 ties
    it breaks by index while this path still orders by true logit — the
    selected *sets* can then differ among score-1.0 anchors.

    MEASURED NOTE (v5e, reference geometry, batch 16): the first version of
    this fusion sliced the cls lanes out (``raw[..., NA:2NA] - raw[..., :NA]``)
    and ran SLOWER in-graph than materializing the score tensor once
    (196.7 -> 149 scenes/s e2e) — the sliced (H, W, NA) intermediates run at
    NA/128 lane utilization. The :func:`_cell_max_logit_diff` lane-roll
    formulation removes those intermediates entirely (one full-width fused
    pass over ``raw``); see tools/bench_cand.py for the head-to-head timing.
    """
    H, W, C = raw.shape
    NA = num_anchors
    # full-width fused pass over raw: no (H, W, NA)-minor intermediate
    cells = _top_cells(_cell_max_logit_diff(raw, NA).reshape(-1), top_k, exact_top_k)
    rows = raw[cells // W, cells % W]  # (k, C) winner rows, one gather
    diff_rows = rows[:, NA : 2 * NA].astype(jnp.float32) - rows[:, :NA].astype(jnp.float32)
    kk = min(top_k, diff_rows.size)
    vals, pos = jax.lax.top_k(diff_rows.reshape(-1), kk)
    sel = pos // NA
    a = pos % NA
    cell_sel = cells[sel]
    scores = jax.nn.sigmoid(vals)
    scores = jnp.where(scores >= score_threshold, scores, -1.0)
    code = (C - 2 * NA) // NA
    deltas = jnp.take_along_axis(
        rows[sel, 2 * NA :].reshape(kk, NA, code), a[:, None, None], axis=1
    )[:, 0]
    top_boxes = decode_boxes(deltas, anchors[cell_sel // W, cell_sel % W, a])
    top_boxes = _pad_to(top_boxes, top_k, 0.0)
    top_scores = _pad_to(scores, top_k, -1.0)
    top_boxes = _mask_invalid_boxes(top_boxes, top_scores)
    keep = _suppress(top_boxes, top_scores, iou_threshold, top_k)
    return top_boxes, top_scores, keep


@functools.partial(jax.jit, static_argnames=("top_k", "exact_top_k"))
def multiclass_nms_decode(
    deltas: jnp.ndarray,
    cls_logits: jnp.ndarray,
    anchors: jnp.ndarray,
    iou_threshold: float,
    score_threshold: float = 0.0,
    top_k: int = 256,
    exact_top_k: bool = False,
):
    """Per-class rotated NMS over encoded predictions (SURVEY.md C20/§4.2:
    the reference ``predict_all`` runs NMS independently per object class).

    Args:
        deltas: (H, W, A, code) per-anchor box deltas (class-agnostic
            regression, as in the reference).
        cls_logits: (H, W, A, C) raw class logits, class 0 = background.
        anchors: (H, W, A, 5).
        others: as :func:`rotated_nms_decode`.

    Each foreground class c gets its own candidate selection (softmax
    probability of c), decode, and greedy suppression — boxes of different
    classes never suppress each other, exactly the reference's per-class
    loop, but as one vmap over the class axis. For C == 2 this reduces to
    :func:`rotated_nms_decode` on the foreground scores.

    Returns:
        boxes ((C-1)*top_k, 5), scores, keep, labels (int32 class ids 1..C-1),
        flattened class-major so downstream host filtering is unchanged.
    """
    C = cls_logits.shape[-1]
    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
    per_class = jnp.moveaxis(probs[..., 1:], -1, 0)  # (C-1, H, W, A)
    nms = functools.partial(
        rotated_nms_decode,
        anchors=anchors,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
        top_k=top_k,
        exact_top_k=exact_top_k,
    )
    boxes, scores, keep = jax.vmap(lambda s: nms(deltas, s))(per_class)
    labels = jnp.broadcast_to(
        jnp.arange(1, C, dtype=jnp.int32)[:, None], (C - 1, top_k)
    )
    return (
        boxes.reshape(-1, 5),
        scores.reshape(-1),
        keep.reshape(-1),
        labels.reshape(-1),
    )


@functools.partial(jax.jit, static_argnames=("top_k", "exact_top_k"))
def rotated_nms_decode(
    deltas: jnp.ndarray,
    scores: jnp.ndarray,
    anchors: jnp.ndarray,
    iou_threshold: float,
    score_threshold: float = 0.0,
    top_k: int = 256,
    exact_top_k: bool = False,
):
    """Rotated NMS over *encoded* predictions: top-k first, decode only winners.

    Identical results to ``decode_boxes`` on all anchors followed by
    :func:`rotated_nms` (the codec is per-anchor, so decoding commutes with
    candidate selection), but decodes K boxes instead of N. At the reference
    geometry N ≈ 400k anchors/frame and the dense decode pass dominated the
    end-to-end pipeline (24.6 of 114.8 ms at batch 16 on v5e).

    Three input layouts:
      * packed spatial (fastest): deltas (H, W, A*code) — the raw head output
        channel layout — with scores (H, W, A), anchors (H, W, A, 5). The
        per-anchor split happens only on the K winners, so the ~400k-anchor
        reg tensor is never relayouted out of its conv-native channel dim.
      * spatial: deltas (H, W, A, code), scores (H, W, A), anchors
        (H, W, A, 5) — candidate selection runs the two-level top-k of
        :func:`_select_candidates_spatial` in the natural layout.
      * flat: deltas (N, code), scores (N,), anchors (N, 5).

    Returns: same fixed-size (boxes, scores, keep) triple as :func:`rotated_nms`.
    """
    if scores.ndim == 3:
        top_scores, (h, w, a) = _select_candidates_spatial(
            scores, score_threshold, top_k, exact_top_k
        )
        if deltas.ndim == 3:  # packed (H, W, A*code): split winners only
            A = scores.shape[-1]
            rows = deltas[h, w].reshape(h.shape[0], A, deltas.shape[-1] // A)
            d = jnp.take_along_axis(rows, a[:, None, None], axis=1)[:, 0]
        else:
            d = deltas[h, w, a]
        top_boxes = decode_boxes(d, anchors[h, w, a])
    else:
        top_scores, idx, _ = _select_candidates(scores, score_threshold, top_k, exact_top_k)
        top_boxes = decode_boxes(deltas[idx], anchors[idx])
        top_boxes = _pad_to(top_boxes, top_k, 0.0)
        top_scores = _pad_to(top_scores, top_k, -1.0)
    top_boxes = _mask_invalid_boxes(top_boxes, top_scores)
    keep = _suppress(top_boxes, top_scores, iou_threshold, top_k)
    return top_boxes, top_scores, keep
