#!/usr/bin/env python
"""Seg backbone A/B: reference-topology UNet vs det-STPN+SegHead (SURVEY C19).

Round-1 shipped seg through the det STPN pyramid with a 1x1 SegHead — a
TPU-first deviation from the reference's UNet seg zoo that VERDICT r1
(missing #6) asked to either replace or measure. Round 2 added the
reference-topology UNet (models/unet.py, now the default); this harness
measures the deviation: trains `--com disco` seg with both backbones x N
seeds on the same synthetic data and reports mIoU mean +/- std per backbone,
so BASELINE.md can state the A/B with error bars.

Resumable like tools/bench_quality.py (shared tools/_bench_harness.py
machinery): finished (backbone, seed) cells are skipped via --out;
interrupted training continues via --auto_resume_path.

Usage:
    python tools/bench_seg_ab.py --root /tmp/v2x_seg_ab --seeds 0 1 2
    python tools/bench_seg_ab.py --root /tmp/v2x_seg_ab --summarize
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

MIOU_RE = re.compile(r"mIoU \|\s+([\d.]+)")
CLASS_RE = re.compile(r"^\s*(\w+) \|\s+([\d.]+)\s*$", re.M)


def run_cell(backbone, seed, args, results, out_path):
    key = f"{args.com}_{backbone}/seed{seed}"
    if key in results:
        print(f"[skip] {key}: {results[key]}")
        return
    logpath = os.path.join(args.root, "logs", f"seed{seed}_{backbone}")
    os.makedirs(logpath, exist_ok=True)
    log_file = os.path.join(logpath, "cell.log")
    # --layer pinned to the reference index: the checked-in A/B numbers
    # (results/seg_ab.json) were measured at layer 3, before the CLIs grew
    # the resolution-aware default (config.default_fusion_layer)
    common = ["--com", args.com, "--seg_backbone", backbone, "--layer", "3",
              "--grid", str(args.grid), "--batch", str(args.batch)]
    t0 = time.time()
    with_retries(f"{key} train", lambda: sh(
        [sys.executable, "tools/seg/train_codet.py",
         "--data", os.path.join(args.root, "train"), *common,
         "--nepoch", str(args.nepoch), "--seed", str(seed),
         "--logpath", logpath, "--auto_resume_path", logpath,
         "--ckpt_every", str(args.nepoch), "--ckpt_keep", "1"], log_file))
    resume = os.path.join(logpath, f"{args.com}_seg", "ckpt")
    stdout = with_retries(f"{key} test", lambda: sh(
        [sys.executable, "tools/seg/test_codet.py",
         "--data", os.path.join(args.root, "val"), *common,
         "--resume", resume], log_file, capture=True))
    m = MIOU_RE.search(stdout)
    if not m:
        raise RuntimeError(f"no mIoU table for {key} (see {log_file})")
    results[key] = {
        "mIoU": float(m.group(1)),
        "iou": {c: float(v) for c, v in CLASS_RE.findall(stdout) if c != "mIoU"},
        "train_s": round(time.time() - t0, 1),
        # seg trains cross-entropy — the det packed/view loss_path does not
        # apply (matches the artifact's backfilled _provenance vocabulary)
        "prov": provenance(args, common, loss_path="n/a (seg CE)"),
    }
    save_results(results, out_path)
    print(f"[done] {key}: mIoU {results[key]['mIoU']}", flush=True)


def summarize(results, com, seeds):
    import numpy as np

    print(f"\n{'backbone':<8} {'mIoU':>18}  n")
    rows = {}
    for backbone in ("unet", "stpn"):
        vals = [results[f"{com}_{backbone}/seed{s}"]["mIoU"] for s in seeds
                if f"{com}_{backbone}/seed{s}" in results]
        if not vals:
            continue
        v = np.array(vals)
        rows[backbone] = v
        print(f"{backbone:<8} {v.mean():.4f} +/- {v.std():.4f}  {len(v)}")
    if len(rows) == 2:
        print("")
        gap_vs_noise("unet - stpn", rows["unet"], rows["stpn"])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, default="/tmp/v2x_seg_ab")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--com", type=str, default="disco")
    p.add_argument("--nepoch", type=int, default=100)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--grid", type=int, default=64)
    p.add_argument("--scenes", type=int, default=24)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--summarize", action="store_true")
    args = p.parse_args(argv)
    out_path = args.out or os.path.join(args.root, "results.json")

    results = load_results(out_path)
    if args.summarize:
        summarize(results, args.com, args.seeds)
        return
    gen_synthetic("tools/seg/create_data_seg.py", args.root, args.grid,
                  {"train": args.scenes, "val": args.scenes}, args.frames)
    for seed in args.seeds:
        for backbone in ("unet", "stpn"):
            run_cell(backbone, seed, args, results, out_path)
    summarize(results, args.com, args.seeds)


if __name__ == "__main__":
    main()
