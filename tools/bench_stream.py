#!/usr/bin/env python
"""Achieved-HBM-bandwidth reference: the PRACTICAL peak for roofline verdicts.

The inference/train rooflines (docs/performance.md) divide XLA cost-model
bytes by the v5e datasheet 819 GB/s. Real fused kernels cannot stream at
datasheet peak — refresh, bank conflicts, and tile boundaries cost a fixed
fraction — so a stage measured "1.1-1.2x off its bound" may already be AT the
achievable ceiling. This tool measures that ceiling with pure-streaming
kernels whose byte counts are exact:

  * incr: x = x + 1         (1R + 1W per element per iteration)
  * axpy: x = x * c + y     (2R + 1W)

Each kernel runs K iterations of a ``lax.fori_loop`` inside ONE jit dispatch
(sequential data dependence through x). Timing follows the repo rule for
the tunneled TPU (CLAUDE.md): a scalar checksum is fetched every call, and
the per-iteration cost is taken from the SLOPE between a K_lo and a K_hi run
— dispatch floor, checksum reduction, and tunnel RTT cancel in the
difference.

Measured caveat (v5e, 2026-08-20): ``incr`` behaves as a true stream
(639-646 GB/s across 256 MiB-1 GiB buffers), but ``axpy`` reports ABOVE the
datasheet peak — XLA partially fuses its loop iterations (y is loop-constant),
so its byte count is overstated. ``peak_frac`` therefore derives from
``incr`` ONLY; axpy is reported for transparency and ignored whenever its
rate exceeds the datasheet (fused) or its slope is non-positive (jitter).

Prints one JSON line, e.g. {"incr_GBs": 639.2, "axpy_GBs": 1010.8,
"axpy_fused": true, "peak_frac": 0.78, ...} — peak_frac = incr/datasheet.

Usage: python tools/bench_stream.py [--mb 256] [--iters 7]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from disconet_tpu.utils.env import setup as _env_setup

_env_setup()

DATASHEET_GBS = 819.0  # TPU v5e HBM peak (docs/performance.md rooflines)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=int, default=256, help="buffer size in MiB")
    p.add_argument("--k_lo", type=int, default=2)
    p.add_argument("--k_hi", type=int, default=12)
    p.add_argument("--iters", type=int, default=7, help="timed calls per point")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    n = args.mb * (1 << 20) // 4  # f32 elements
    side = int(n ** 0.5) // 256 * 256  # (8,128)-tileable square
    x0 = jnp.ones((side, side), jnp.float32)
    y0 = jnp.full((side, side), 0.5, jnp.float32)
    buf_bytes = side * side * 4

    def make(kind, k):
        if kind == "incr":  # 1R + 1W per iter
            def body(_, x):
                return x + 1.0
            per_iter = 2 * buf_bytes
        else:  # axpy: 2R + 1W per iter
            def body(_, x):
                return x * 0.999999 + y0
            per_iter = 3 * buf_bytes

        @jax.jit
        def f(x):
            return lax.fori_loop(0, k, body, x).sum()

        return f, per_iter

    def timed(f):
        float(f(x0))  # compile + warm
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(f(x0))  # scalar fetch = true completion (tunnel rule)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]  # median

    report = {"buf_mb": buf_bytes >> 20, "k": [args.k_lo, args.k_hi],
              "datasheet_GBs": DATASHEET_GBS}
    for kind in ("incr", "axpy"):
        f_lo, per_iter = make(kind, args.k_lo)
        f_hi, _ = make(kind, args.k_hi)
        t_lo, t_hi = timed(f_lo), timed(f_hi)
        report[f"{kind}_ms"] = [round(t_lo * 1e3, 2), round(t_hi * 1e3, 2)]
        if t_hi - t_lo <= 0:  # tunnel jitter swamped the slope: no number
            report[f"{kind}_GBs"] = None
            continue
        gbs = per_iter * (args.k_hi - args.k_lo) / (t_hi - t_lo) / 1e9
        report[f"{kind}_GBs"] = round(gbs, 1)
    # the practical-ceiling claim rests on incr alone (see docstring caveat)
    incr = report.get("incr_GBs")
    report["axpy_fused"] = bool(report.get("axpy_GBs")
                                and report["axpy_GBs"] > DATASHEET_GBS)
    report["peak_frac"] = (round(incr / DATASHEET_GBS, 3)
                           if incr and incr > 0 else None)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
