#!/usr/bin/env python
"""Render a quality-matrix results.json as a markdown table (for BASELINE.md).

The matrices are produced by tools/bench_quality.py / tools/bench_seg_ab.py
and checked into results/ (VERDICT r2 missing #3: no measured claim may live
only under /tmp). This renderer regenerates the BASELINE.md tables from the
committed JSON so the doc and the artifact cannot drift.

Usage:
    python tools/results_to_md.py results/occluded_matrix.json
    python tools/results_to_md.py results/seg_ab.json --metric mIoU
"""

from __future__ import annotations

import argparse
import json
import re
from collections import defaultdict

import numpy as np


def group(results: dict) -> dict:
    """{'name/seedN': cell} -> {name: [cell, ...]} (seed-sorted)."""
    out = defaultdict(list)
    for key in sorted(results):
        m = re.fullmatch(r"(.+)/seed(\d+)", key)
        if m:
            out[m.group(1)].append(results[key])
    return dict(out)


def fmt(vals) -> str:
    a = np.asarray(vals, dtype=float)
    if len(a) == 1:
        return f"{a[0]:.4f} (n=1)"
    return f"{a.mean():.4f} ± {a.std():.4f}"


def render(results: dict, metrics: list[str]) -> str:
    rows = group(results)
    lines = ["| config | " + " | ".join(metrics) + " | n |",
             "|---|" + "---|" * (len(metrics) + 1)]
    for name, cells in rows.items():
        cols = []
        for met in metrics:
            vals = [c[met] for c in cells if met in c]
            cols.append(fmt(vals) if vals else "—")
        lines.append(f"| {name} | " + " | ".join(cols) + f" | {len(cells)} |")
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("path")
    p.add_argument("--metric", nargs="+", default=None,
                   help="metrics to tabulate (default: auto-detect mAP/MOT/mIoU keys)")
    args = p.parse_args(argv)
    with open(args.path) as f:
        results = json.load(f)
    metrics = args.metric
    if metrics is None:
        seen = {k for cell in results.values() for k in cell}
        metrics = [m for m in ("mAP@0.5", "mAP@0.7", "MOTA", "MOTP", "mIoU")
                   if m in seen]
    print(render(results, metrics))


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into `head`
        pass
