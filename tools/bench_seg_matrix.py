#!/usr/bin/env python
"""Segmentation fusion-ordering matrix (VERDICT r4 missing #2 / task #3).

The reference benchmarks segmentation across the same fusion variants as
detection (README.md:37 links the seg benchmark page; README.md:42-50 runs the
identical train/test commands per --com inside tools/seg; SURVEY.md C19/C24).
Until round 5 the repo's only seg quality artifact was a backbone A/B at
`--com disco` (results/seg_ab.json) — the task was implemented but its
collaboration story unmeasured. This harness trains the seg operating points
(lowerbound / disco / upperbound, optionally v2v / when2com) x N seeds on the
OCCLUDED synthetic protocol (the det matrix's lesson: without LiDAR shadowing
the task saturates and fusion gaps drown in noise) and reports mIoU mean±std
plus ordering verdicts, reusing tools/_bench_harness.py end to end.

Resumable like bench_quality: finished (config, seed) cells are skipped via
--out; interrupted training continues via --auto_resume_path.

Usage:
    python tools/bench_seg_matrix.py --root /tmp/v2x_seg_matrix --seeds 0 1 2
    python tools/bench_seg_matrix.py --root /tmp/v2x_seg_matrix --summarize
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _bench_harness import (  # noqa: E402
    gap_vs_noise, gen_synthetic, load_results, provenance, save_results, sh,
    with_retries)
from bench_quality import epoch_loss_stats  # noqa: E402  (same log format)

# operating point -> seg CLI flags. Fusion layer pinned to the
# resolution-matched index (config.default_fusion_layer == 2 at 64-grid: the
# fusion map stays >=16x16, the same relative resolution as the reference's
# 32x32-at-256 default) — the det matrix showed layer 3 at 64-grid fuses on
# 8x8 maps, too coarse to transport neighbor-only content.
CONFIGS = {
    "lowerbound": ["--bound", "lowerbound", "--layer", "2"],
    "upperbound": ["--bound", "upperbound", "--layer", "2"],
    "disco": ["--com", "disco", "--layer", "2"],
    "v2v": ["--com", "v2v", "--layer", "2"],
    "when2com": ["--com", "when2com", "--layer", "2"],
}

# the paper's seg ordering claims, checked against their own noise floors
# (single-sourced for --summarize and results_to_md --orderings --metric mIoU)
SEG_ORDERINGS = [
    ("upperbound", "lowerbound"), ("disco", "lowerbound"),
    ("upperbound", "disco"),
    ("v2v", "lowerbound"), ("when2com", "lowerbound"),
    ("disco", "v2v"), ("disco", "when2com"), ("v2v", "when2com"),
]

MIOU_RE = re.compile(r"mIoU \|\s+([\d.]+)")
CLASS_RE = re.compile(r"^\s*(\w+) \|\s+([\d.]+)\s*$", re.M)


def run_cell(name, seed, args, results, out_path):
    key = f"{name}/seed{seed}"
    if key in results:
        print(f"[skip] {key}: {results[key]}")
        return
    logpath = os.path.join(args.root, "logs", f"seed{seed}")
    os.makedirs(logpath, exist_ok=True)
    log_file = os.path.join(logpath, f"{name}.log")
    flags = list(CONFIGS[name])
    common = [*flags, "--seg_backbone", args.backbone,
              "--grid", str(args.grid), "--batch", str(args.batch)]
    t0 = time.time()
    with_retries(f"{key} train", lambda: sh(
        [sys.executable, "tools/seg/train_codet.py",
         "--data", os.path.join(args.root, "train"), *common,
         "--nepoch", str(args.nepoch), "--seed", str(seed),
         "--logpath", logpath, "--auto_resume_path", logpath,
         "--ckpt_every", str(args.nepoch), "--ckpt_keep", "1",
         # 8 optimizer steps per dispatch: 64-grid steps are tunnel-RTT-bound
         # (the det matrix measured 3.5x; the seg CLI shares the machinery)
         "--steps_per_dispatch", "8"], log_file))
    # the seg CLI writes under (com or bound) + '_seg' == the config name
    resume = os.path.join(logpath, name + "_seg", "ckpt")
    stdout = with_retries(f"{key} test", lambda: sh(
        [sys.executable, "tools/seg/test_codet.py",
         "--data", os.path.join(args.root, "val"), *common,
         "--resume", resume], log_file, capture=True))
    m = MIOU_RE.search(stdout)
    if not m:
        raise RuntimeError(f"no mIoU table for {key} (see {log_file})")
    cell = {
        "mIoU": float(m.group(1)),
        "iou": {c: float(v) for c, v in CLASS_RE.findall(stdout) if c != "mIoU"},
        "train_s": round(time.time() - t0, 1),
        "prov": provenance(args, common, loss_path="n/a (seg CE)"),
    }
    # save-point quality stamp (final-epoch-only checkpoints, like the det
    # matrix pre-r5; the 'epoch N done ... loss=' format is shared)
    cell.update(epoch_loss_stats(log_file))
    results[key] = cell
    save_results(results, out_path)
    print(f"[done] {key}: mIoU {cell['mIoU']}", flush=True)


def summarize(results, configs, seeds):
    import numpy as np

    print(f"\n{'config':<12} {'mIoU':>18}  n")
    rows = {}
    for name in configs:
        vals = [results[f"{name}/seed{s}"]["mIoU"] for s in seeds
                if f"{name}/seed{s}" in results]
        if not vals:
            continue
        v = np.array(vals)
        rows[name] = v
        print(f"{name:<12} {v.mean():.4f} +/- {v.std():.4f}  {len(v)}")
    print("\nordering checks (gap vs combined std, mIoU):")
    for hi, lo in SEG_ORDERINGS:
        if hi in rows and lo in rows:
            gap_vs_noise(f"{hi} - {lo}", rows[hi], rows[lo])
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, default="/tmp/v2x_seg_matrix")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--configs", type=str, nargs="+", default=list(CONFIGS))
    p.add_argument("--backbone", type=str, default="unet",
                   help="seg architecture (the measured default; the stpn A/B "
                        "lives in results/seg_ab.json)")
    p.add_argument("--nepoch", type=int, default=100)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--grid", type=int, default=64)
    p.add_argument("--scenes", type=int, default=24)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--occlusion", type=int, default=1,
                   help="LiDAR shadowing in the synthetic splits (default ON: "
                        "the det matrix saturated without it)")
    p.add_argument("--summarize", action="store_true")
    args = p.parse_args(argv)
    out_path = args.out or os.path.join(args.root, "results.json")

    results = load_results(out_path)
    if args.summarize:
        summarize(results, args.configs, args.seeds)
        return
    gen_synthetic("tools/seg/create_data_seg.py", args.root, args.grid,
                  {"train": args.scenes, "val": args.scenes}, args.frames,
                  extra=["--occlusion", "1"] if args.occlusion else None)
    for seed in args.seeds:
        for name in args.configs:
            run_cell(name, seed, args, results, out_path)
    summarize(results, args.configs, args.seeds)


if __name__ == "__main__":
    main()
