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
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_quality import NONFINITE_LOSS  # noqa: E402  (single-sourced sentinel)


def spiked(cell: dict, max_loss_ratio: float) -> bool:
    """Off-trajectory-save detector for --max_loss_ratio: the checkpoint
    captured a final-dispatch loss spike (final ≫ min end-of-epoch loss), or a
    nan/inf epoch (stamped as NONFINITE_LOSS by the harness — imported, not
    duplicated, so a sentinel change cannot silently disable this filter)."""
    f, m = cell.get("final_epoch_loss"), cell.get("min_epoch_loss")
    if f is None or m is None:  # truthiness would let min==0.0 (a fully-
        return False            # converged cell) disable the filter for the
    # maximal-spike case
    return f > max_loss_ratio * m or f >= NONFINITE_LOSS


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


def render_orderings(results: dict, metric: str = "mAP@0.7") -> str:
    """The ordering-verdict table (bench_quality --summarize) as markdown,
    from the same ORDERINGS list and ordering_stats semantics — so the
    BASELINE.md verdict table regenerates from the artifact instead of being
    hand-assembled from console output (the r2/r3 doc-drift failure class)."""
    from _bench_harness import ordering_stats
    from bench_quality import ORDERINGS, TRACK_ORDERINGS

    if metric == "MOTA":
        pairs = TRACK_ORDERINGS
    elif metric == "mIoU":
        from bench_seg_matrix import SEG_ORDERINGS

        pairs = SEG_ORDERINGS
    else:
        pairs = ORDERINGS
    rows = group(results)
    lines = [f"| claim ({metric}) | gap | noise | verdict |",
             "|---|---|---|---|"]
    for hi, lo in pairs:
        if hi not in rows or lo not in rows:
            continue
        s = ordering_stats([c[metric] for c in rows[hi] if metric in c],
                           [c[metric] for c in rows[lo] if metric in c])
        noise = f"{s['noise']:.4f}" if s["noise"] is not None else "—"
        verdict = (f"**{s['verdict']}**" if s["verdict"] == "SIGNIFICANT"
                   else s["verdict"])
        lines.append(f"| {hi} − {lo} | {s['gap']:+.4f} | {noise} | {verdict} "
                     f"(n={s['n_hi']} vs {s['n_lo']}) |")
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("path")
    p.add_argument("--metric", nargs="+", default=None,
                   help="metrics to tabulate (default: auto-detect mAP/MOT/mIoU keys)")
    p.add_argument("--orderings", action="store_true",
                   help="render the ordering-verdict table (bench_quality "
                        "ORDERINGS x ordering_stats) instead of the cell table")
    p.add_argument("--max_loss_ratio", type=float, default=0,
                   help="sensitivity filter: drop cells whose final_epoch_loss "
                        "exceeds R x min_epoch_loss (an off-trajectory save — "
                        "the checkpoint captured a final-dispatch loss spike, "
                        "see bench_quality.epoch_loss_stats). 0 = keep all. "
                        "Dropped cells are listed on stderr; report verdicts "
                        "both with and without the filter")
    args = p.parse_args(argv)
    with open(args.path) as f:
        results = json.load(f)
    if args.max_loss_ratio:
        dropped = [k for k, v in results.items()
                   if isinstance(v, dict) and spiked(v, args.max_loss_ratio)]
        for k in dropped:
            c = results.pop(k)
            print(f"[excluded] {k}: final_epoch_loss {c['final_epoch_loss']} > "
                  f"{args.max_loss_ratio} x min {c['min_epoch_loss']}",
                  file=sys.stderr)
    if args.orderings:
        print(render_orderings(results, (args.metric or ["mAP@0.7"])[0]))
        return
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
