#!/usr/bin/env python
"""Head-to-head timing of the candidate-selection paths (profiling aid).

The +cand/decode stage of bench.py's pipeline (tools/bench_stages.py) costs
~11 ms of the 82 ms batch-16 step with the dense-score path. This microbench
times the three formulations standalone on a synthetic packed head tensor at
the reference geometry (96 frames x 256^2 x (2+6)*6 lanes):

  dense   — materialize sigmoid scores (H, W, NA), two-level top-k on them
            (packed_scores_and_deltas + _select_candidates_spatial): the
            production path before the lane-roll fix.
  packed  — rotated_nms_decode_packed's selection: lane-roll cell max
            (_cell_max_logit_diff, ONE fused full-width pass over raw),
            winner-row gather, winners-only sigmoid/decode.
  full    — both variants through suppression (the e2e-relevant compare).

Usage: python tools/bench_cand.py   (BENCH_BATCH=16 default)

MEASURED (v5e, 2026-08-19, 96 frames): dense_cand 9.0 / packed_cand 44.2 ms;
the q_* prefix probes attribute the packed path's cost: q_cellmax 8.7 ms —
the rolled-formulation cell-max pass (f32 upcast + ``jnp.roll`` + subtract/
lane-mask/minor-dim max; no probe isolates the roll alone) is ~3x
the dense path's whole score-materialization pass (p_cellmax 3.1 ms: sigmoid
scores + minor-dim max fuse into one read of ``raw``); the winner-row gather
adds only ~1 ms (q_rowgather - q_l1topk), and the remaining ~33 ms sits in
the tiny post-gather ops XLA schedules poorly in this formulation. Conclusion:
cross-lane shuffles of HBM-resident tensors cost like relayouts, and the
dense path (config.packed_nms=False) stays the production default.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from disconet_tpu.utils.env import setup as _env_setup

_env_setup()

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
AGENTS = 6
WARMUP = 2
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from disconet_tpu.config import Config
    from disconet_tpu.ops.boxes import decode_boxes, make_anchors
    from disconet_tpu.ops.nms import (
        _cell_max_logit_diff,
        _select_candidates_spatial,
        _top_cells,
        packed_scores_and_deltas,
        rotated_nms_decode,
        rotated_nms_decode_packed,
    )

    cfg = Config()
    H, W, _ = cfg.grid_size
    NA, code = cfg.num_anchors, cfg.box_code_size
    N = BATCH * AGENTS
    rng = np.random.default_rng(0)
    raw = jnp.asarray(
        rng.normal(0, 2, size=(N, H, W, NA * (2 + code))).astype(np.float32),
        dtype=jnp.bfloat16,
    )
    anchors = jnp.asarray(make_anchors(cfg))
    K = cfg.nms_top_k
    kw = dict(
        iou_threshold=cfg.nms_iou_threshold,
        score_threshold=cfg.score_threshold,
        top_k=K,
    )

    def checksum(*arrays):
        return sum(jnp.sum(a.astype(jnp.float32)) for a in arrays)

    def dense_cand(raw):
        def one(r):
            scores, deltas = packed_scores_and_deltas(r, NA)
            vals, (h, w, a) = _select_candidates_spatial(
                scores, cfg.score_threshold, K, False
            )
            rows = deltas[h, w].reshape(-1, NA, code)
            d = jnp.take_along_axis(rows, a[:, None, None], axis=1)[:, 0]
            return checksum(decode_boxes(d, anchors[h, w, a]), vals)

        return jnp.sum(jax.vmap(one)(raw))

    def packed_cand(raw):
        def one(r):
            cells = _top_cells(_cell_max_logit_diff(r, NA).reshape(-1), K, False)
            rows = r[cells // W, cells % W]
            diff_rows = rows[:, NA : 2 * NA].astype(jnp.float32) - rows[:, :NA].astype(
                jnp.float32
            )
            vals, pos = jax.lax.top_k(diff_rows.reshape(-1), K)
            sel, a = pos // NA, pos % NA
            cell_sel = cells[sel]
            d = jnp.take_along_axis(
                rows[sel, 2 * NA :].astype(jnp.float32).reshape(K, NA, code),
                a[:, None, None],
                axis=1,
            )[:, 0]
            return checksum(
                decode_boxes(d, anchors[cell_sel // W, cell_sel % W, a]),
                jax.nn.sigmoid(vals),
            )

        return jnp.sum(jax.vmap(one)(raw))

    def dense_full(raw):
        def one(r):
            scores, deltas = packed_scores_and_deltas(r, NA)
            return checksum(*rotated_nms_decode(deltas, scores, anchors, **kw))

        return jnp.sum(jax.vmap(one)(raw))

    def packed_full(raw):
        def one(r):
            return checksum(*rotated_nms_decode_packed(r, anchors, NA, **kw))

        return jnp.sum(jax.vmap(one)(raw))

    # diagnostic probes: split the dense path into its memory pass vs top-k
    def probe_scores_only(raw):
        def one(r):
            scores, _ = packed_scores_and_deltas(r, NA)
            return checksum(scores)

        return jnp.sum(jax.vmap(one)(raw))

    def probe_cellmax_only(raw):
        def one(r):
            scores, _ = packed_scores_and_deltas(r, NA)
            return checksum(jnp.max(scores, axis=-1))

        return jnp.sum(jax.vmap(one)(raw))

    def probe_level1_topk(raw):
        def one(r):
            scores, _ = packed_scores_and_deltas(r, NA)
            cm = jnp.max(scores, axis=-1).reshape(-1)
            _, cells = jax.lax.approx_max_k(cm, K, recall_target=0.99)
            return checksum(cells.astype(jnp.float32))

        return jnp.sum(jax.vmap(one)(raw))

    # packed-path probes: where do packed_cand's ms go? (q_* = cumulative
    # prefixes of the packed formulation)
    def q_cellmax(raw):
        def one(r):
            return checksum(_cell_max_logit_diff(r, NA))

        return jnp.sum(jax.vmap(one)(raw))

    def q_l1topk(raw):
        def one(r):
            cells = _top_cells(_cell_max_logit_diff(r, NA).reshape(-1), K, False)
            return checksum(cells.astype(jnp.float32))

        return jnp.sum(jax.vmap(one)(raw))

    def q_rowgather(raw):
        def one(r):
            cells = _top_cells(_cell_max_logit_diff(r, NA).reshape(-1), K, False)
            rows = r[cells // W, cells % W]
            return checksum(rows)

        return jnp.sum(jax.vmap(one)(raw))

    def q_rowgather_flat(raw):
        # same gather expressed over the flattened (H*W, C) view
        def one(r):
            cells = _top_cells(_cell_max_logit_diff(r, NA).reshape(-1), K, False)
            rows = jnp.take(r.reshape(H * W, -1), cells, axis=0)
            return checksum(rows)

        return jnp.sum(jax.vmap(one)(raw))

    for name, fn in [
        ("dense_cand", dense_cand),
        ("packed_cand", packed_cand),
        ("dense_full", dense_full),
        ("packed_full", packed_full),
        ("p_scores", probe_scores_only),
        ("p_cellmax", probe_cellmax_only),
        ("p_l1topk", probe_level1_topk),
        ("q_cellmax", q_cellmax),
        ("q_l1topk", q_l1topk),
        ("q_rowgather", q_rowgather),
        ("q_rowgather_flat", q_rowgather_flat),
    ]:
        f = jax.jit(fn)
        for _ in range(WARMUP):
            float(f(raw))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = f(raw)
        float(out)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:>12}: {dt * 1e3:8.2f} ms / {N} frames", flush=True)


if __name__ == "__main__":
    main()
