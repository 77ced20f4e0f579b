#!/usr/bin/env python
"""Microbench of the predict tail: candidate selection + winner decode.

The +cand/decode stage of tools/bench_stages.py costs ~11 ms of the 82 ms
batch-16 pipeline. This isolates it on a synthetic packed head tensor
(B*A, H, W, NA*(2+code)) and times variants:

  current   — packed_scores_and_deltas (f32 score tensor) + two-level top-k
              (the production path, ops/nms.py)
  diff_f32  — materialize the f32 logit-diff tensor (skip the sigmoid over
              ~400k anchors), select on it, sigmoid winners only
  diff_bf16 — same but the selection tensor stays bf16 (half the HBM round
              trip); winner scores recomputed in f32 from the gathered raw
              rows, so output values match `current` exactly — only near-tie
              *selection* can differ by bf16 rounding
  exact_l1  — current but with exact lax.top_k at level 1 (approx_max_k cost)

(The fully-fused rotated_nms_decode_packed variant — no materialized selection
tensor at all — was measured in-graph on 2026-08-17: 196.7 -> 149 scenes/s;
see its docstring in ops/nms.py. diff_f32/diff_bf16 here probe the half-way
point and lose the same way.)

Each variant ends in the same winner gather + decode_boxes; NMS suppression is
excluded (identical across variants). Prints ms per call over the whole batch.

MEASURED (v5e, 96 frames, reference geometry, 2026-08-18):
    current      8.56 ms   <- production path stays the winner
    diff_f32    36.20 ms   (fusing selection into the raw-slice read makes XLA
    diff_bf16   38.25 ms    do strided lane extraction inside the reduce - 4x)
    exact_l1    12.74 ms   (exact lax.top_k at level 1 vs approx_max_k: +4 ms)
Confirms the in-graph 2026-08-17 measurement that motivated materializing the
score tensor (ops/nms.py rotated_nms_decode_packed docstring).
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

FRAMES = int(os.environ.get("BENCH_FRAMES", "96"))  # 16 scenes x 6 agents
WARMUP = 2
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from disconet_tpu.config import Config
    from disconet_tpu.ops.boxes import decode_boxes, make_anchors
    from disconet_tpu.ops.nms import (
        _select_candidates_spatial,
        _top_cells,
        packed_scores_and_deltas,
    )

    cfg = Config()
    H, W = cfg.bev_shape[:2]
    NA, code = cfg.num_anchors, cfg.box_code_size
    C = NA * (2 + code)
    K = cfg.nms_top_k

    rng = np.random.default_rng(0)
    raw_np = rng.normal(0.0, 2.0, size=(FRAMES, H, W, C)).astype(np.float32)
    raw = jnp.asarray(raw_np, dtype=jnp.bfloat16)
    anchors = jnp.asarray(make_anchors(cfg))

    def gather_decode(deltas_hwc, h, w, a):
        rows = deltas_hwc[h, w].reshape(h.shape[0], NA, code)
        d = jnp.take_along_axis(rows, a[:, None, None], axis=1)[:, 0]
        return decode_boxes(d, anchors[h, w, a])

    def current(raw):
        def one(r):
            scores, deltas = packed_scores_and_deltas(r, NA)
            vals, (h, w, a) = _select_candidates_spatial(
                scores, cfg.score_threshold, K, False
            )
            return jnp.sum(gather_decode(deltas, h, w, a)) + jnp.sum(vals)

        return jnp.sum(jax.vmap(one)(raw))

    def _diff_variant(raw, sel_dtype):
        def one(r):
            diff = r[..., NA : 2 * NA].astype(sel_dtype) - r[..., :NA].astype(sel_dtype)
            cells = _top_cells(jnp.max(diff, axis=-1).reshape(-1), K, False)
            rows = r[cells // W, cells % W]  # (k, C) winner rows in raw bf16
            diff_rows = rows[:, NA : 2 * NA].astype(jnp.float32) - rows[
                :, :NA
            ].astype(jnp.float32)
            vals, pos = jax.lax.top_k(diff_rows.reshape(-1), K)
            cell_sel = cells[pos // NA]
            a = pos % NA
            scores = jax.nn.sigmoid(vals)
            scores = jnp.where(scores >= cfg.score_threshold, scores, -1.0)
            deltas = jnp.take_along_axis(
                rows[pos // NA, 2 * NA :].reshape(K, NA, code), a[:, None, None], axis=1
            )[:, 0]
            boxes = decode_boxes(deltas, anchors[cell_sel // W, cell_sel % W, a])
            return jnp.sum(boxes) + jnp.sum(scores)

        return jnp.sum(jax.vmap(one)(raw))

    def exact_l1(raw):
        def one(r):
            scores, deltas = packed_scores_and_deltas(r, NA)
            vals, (h, w, a) = _select_candidates_spatial(
                scores, cfg.score_threshold, K, True
            )
            return jnp.sum(gather_decode(deltas, h, w, a)) + jnp.sum(vals)

        return jnp.sum(jax.vmap(one)(raw))

    variants = {
        "current": current,
        "diff_f32": functools.partial(_diff_variant, sel_dtype=jnp.float32),
        "diff_bf16": functools.partial(_diff_variant, sel_dtype=jnp.bfloat16),
        "exact_l1": exact_l1,
    }

    for name, fn in variants.items():
        jf = jax.jit(fn)
        for _ in range(WARMUP):
            float(jf(raw))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = jf(raw)
        float(out)  # FIFO queue syncs all ITERS (see bench.py)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:>10}: {dt * 1e3:7.2f} ms / {FRAMES} frames", flush=True)


if __name__ == "__main__":
    main()
