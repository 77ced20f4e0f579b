#!/usr/bin/env python
"""Per-stage breakdown of the bench.py e2e pipeline (profiling aid, SURVEY.md §5.2).

Times cumulative prefixes of the inference pipeline on the flagship DiscoNet —
voxelize | +encode | +warp/fuse | +decode+heads | +NMS — each as its own jitted
graph with a scalar-checksum fetch (the only reliable execution barrier over
the axon tunnel, see bench.py). Per-stage cost = difference of neighbors;
prefixes share the cached compile across runs.

Usage: python tools/bench_stages.py  (BENCH_BATCH=16 by default, as bench.py)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from disconet_tpu.utils.env import setup as _env_setup

_env_setup()

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
AGENTS = 6
POINTS = 16384
WARMUP = 2
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from disconet_tpu.config import Config
    from disconet_tpu.models import build_model
    from disconet_tpu.models.base import agents_to_batch, batch_to_agents, warp_all_pairs
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

    bev0 = voxelize_occupy_jax(jnp.asarray(pts[0, 0]), cfg.voxel_size, cfg.area_extents)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((BATCH, AGENTS) + bev0.shape, jnp.float32),
        jnp.asarray(trans),
        jnp.asarray(mask),
    )
    anchors = make_anchors(cfg)
    nms = functools.partial(
        rotated_nms_decode,
        anchors=jnp.asarray(anchors),
        iou_threshold=cfg.nms_iou_threshold,
        score_threshold=cfg.score_threshold,
        top_k=cfg.nms_top_k,
    )

    def checksum(*arrays):
        return sum(jnp.sum(a.astype(jnp.float32)) for a in arrays)

    # stage bodies mirror IntermediateFusionModel.__call__ (models/base.py) via
    # model.bind so the per-stage graphs use the same submodules as bench.py
    def stages(variables, pts, trans, mask, upto):
        if upto == -1:  # overhead floor: dispatch + checksum fetch, ~no compute
            return checksum(mask)
        bev = voxelize_occupy_jax(pts, cfg.voxel_size, cfg.area_extents)
        if upto == 0:
            return checksum(bev)
        m = model.bind(variables)
        B, A = bev.shape[0], bev.shape[1]
        x = agents_to_batch(bev.astype(jnp.float32))
        feats = m.stpn.encode(x, False)
        if upto == 1:
            return checksum(feats[-1])
        k = model.layer
        fk = batch_to_agents(feats[k], B, A)
        warped = warp_all_pairs(fk, trans, cfg.area_extents[:2])
        fused = m.fuse(fk, warped, mask, False, trans=trans)
        if upto == 2:
            return checksum(fused)
        feats = list(feats)
        feats[k] = agents_to_batch(fused)
        head_in, _ = m.stpn.decode(feats, False)
        _, _, raw, _ = m.heads(head_in)
        if upto == 3:
            return checksum(raw)
        # packed fast path (ops/nms.py helper)
        NA = cfg.num_anchors
        scores, deltas = packed_scores_and_deltas(raw, NA)
        if upto == 4:  # candidate selection + winner decode, no suppression
            from disconet_tpu.ops.boxes import decode_boxes
            from disconet_tpu.ops.nms import _select_candidates_spatial

            def cand(d, sc):
                vals, (h, w, a) = _select_candidates_spatial(
                    sc, cfg.score_threshold, cfg.nms_top_k, False
                )
                rows = d[h, w].reshape(-1, NA, d.shape[-1] // NA)
                dd = jnp.take_along_axis(rows, a[:, None, None], axis=1)[:, 0]
                return checksum(decode_boxes(dd, jnp.asarray(anchors)[h, w, a]), vals)

            return jnp.sum(jax.vmap(cand)(deltas, scores))
        b, s, keep = jax.vmap(nms)(deltas, scores)
        return checksum(b, s, keep)

    # DECODER_SUBSTAGES=1: split the decode/heads stage into per-decoder-stage
    # prefixes (dec3 @32^2 ... dec0 @256^2, then head_conv, then the head
    # matmul) — mirrors STPN.decode (models/backbone.py)
    def decoder_prefix(variables, pts, trans, mask, upto):
        bev = voxelize_occupy_jax(pts, cfg.voxel_size, cfg.area_extents)
        m = model.bind(variables)
        B, A = bev.shape[0], bev.shape[1]
        x = agents_to_batch(bev.astype(jnp.float32))
        feats = m.stpn.encode(x, False)
        k = model.layer
        fk = batch_to_agents(feats[k], B, A)
        warped = warp_all_pairs(fk, trans, cfg.area_extents[:2])
        fused = m.fuse(fk, warped, mask, False, trans=trans)
        feats = list(feats)
        feats[k] = agents_to_batch(fused)
        x = feats[-1]
        n_dec = len(m.stpn.dec)
        for step, i in enumerate(reversed(range(n_dec))):
            x = m.stpn.decode_step(x, feats, i, False)
            if upto == step:
                return checksum(x)
        x = m.stpn.head_conv(x, False)
        if upto == n_dec:
            return checksum(x)
        _, _, raw, _ = m.heads(x)
        return checksum(raw)

    args = (variables, jnp.asarray(pts), jnp.asarray(trans), jnp.asarray(mask))
    if os.environ.get("DECODER_SUBSTAGES"):
        prev = 0.0
        for upto, name in enumerate(["dec3@32", "dec2@64", "dec1@128", "dec0@256", "head_conv", "heads"]):
            fn = jax.jit(functools.partial(decoder_prefix, upto=upto))
            for _ in range(WARMUP):
                float(fn(*args))
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(*args)
            float(out)
            dt = (time.perf_counter() - t0) / ITERS
            print(f"{name:>10}: cumulative {dt * 1e3:8.2f} ms  (+{(dt - prev) * 1e3:6.2f})", flush=True)
            prev = dt
        return

    names = ["null", "voxelize", "+encode", "+warp/fuse", "+decode/heads", "+cand/decode", "+nms"]
    roofline = bool(os.environ.get("ROOFLINE"))
    cum, cost = [], []
    for upto, name in enumerate(names, start=-1):
        fn = jax.jit(functools.partial(stages, upto=upto))
        if roofline:
            # time through the same AOT executable the cost model comes from:
            # .lower().compile() does not populate jit's call cache, so
            # falling back to fn(*args) would compile each prefix twice
            # (minutes per remote compile here when the persistent cache is
            # cold).
            compiled = fn.lower(*args).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            cost.append((float(ca.get("flops", 0.0)),
                         float(ca.get("bytes accessed", 0.0))))
            fn = compiled
        for _ in range(WARMUP):
            float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        float(out)  # FIFO queue: syncs all ITERS executions
        dt = (time.perf_counter() - t0) / ITERS
        cum.append(dt)
        print(f"{name:>14}: cumulative {dt * 1e3:8.2f} ms", flush=True)

    report = {}
    prev = 0.0
    for name, c in zip(names, cum):
        report[name] = round((c - prev) * 1e3, 2)
        prev = c
    report["total_ms"] = round(cum[-1] * 1e3, 2)
    report["scenes_per_sec"] = round(BATCH / cum[-1], 1)
    print(json.dumps(report))

    if roofline:
        # Roofline per stage (VERDICT r1 weak #3 / next #10): flops & HBM
        # bytes from XLA's own cost model of each compiled prefix, differenced
        # like the timings (fusion across a prefix boundary is the error term).
        # attainable ms = max(compute-bound, bandwidth-bound); % is
        # measured/attainable — how far off speed-of-light each stage runs.
        peak_tflops = float(os.environ.get("PEAK_TFLOPS", "197"))  # v5e bf16
        hbm_gbps = float(os.environ.get("HBM_GBPS", "819"))  # v5e HBM
        print(f"\nroofline vs v5e peaks ({peak_tflops:.0f} TFLOP/s bf16, "
              f"{hbm_gbps:.0f} GB/s HBM):")
        print(f"{'stage':>14} {'meas ms':>8} {'GFLOP':>8} {'MB':>9} "
              f"{'flop ms':>8} {'bw ms':>8} {'attain':>8} {'x-off':>6}")
        rows = {}
        pf = pb = pt = 0.0
        for name, (f, b), c in zip(names, cost, cum):
            df, db, dt = f - pf, b - pb, c - pt
            pf, pb, pt = f, b, c
            t_flop = df / (peak_tflops * 1e12) * 1e3
            t_bw = db / (hbm_gbps * 1e9) * 1e3
            attain = max(t_flop, t_bw)
            off = (dt * 1e3) / attain if attain > 0 else float("inf")
            rows[name] = {"ms": round(dt * 1e3, 2), "gflop": round(df / 1e9, 1),
                          "mb": round(db / 1e6, 1), "attain_ms": round(attain, 2),
                          "x_off": round(off, 2)}
            print(f"{name:>14} {dt * 1e3:8.2f} {df / 1e9:8.1f} {db / 1e6:9.1f} "
                  f"{t_flop:8.2f} {t_bw:8.2f} {attain:8.2f} {off:6.2f}")
        print(json.dumps({"roofline": rows}))


if __name__ == "__main__":
    main()
