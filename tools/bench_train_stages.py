#!/usr/bin/env python
"""Per-stage fwd AND bwd attribution of the training step (VERDICT r2 #4).

The inference pipeline has a measured roofline (tools/bench_stages.py +
docs/performance.md); this is the train-step analog. Each pipeline prefix —
encode | +warp/fuse | +decode | +heads+loss — is compiled twice, once
forward-only (train=True: real BN batch stats) and once wrapped in
``jax.value_and_grad`` with the gradients kept live via ``global_norm`` (so
XLA cannot dead-code-eliminate the backward pass). Differencing neighbors
gives per-stage forward cost; differencing the two rows gives per-stage
backward cost. ``ROOFLINE=1`` additionally prints XLA cost-model flops/bytes
per prefix (differenced the same way).

Timing protocol is bench.py's: a scalar checksum fetch is the only reliable
execution barrier across the axon tunnel (CLAUDE.md).

Usage:
    python tools/bench_train_stages.py --data /tmp/v2x_train256/train
    ROOFLINE=1 python tools/bench_train_stages.py --data ... --steps 5
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from disconet_tpu.utils.env import setup as _env_setup

_env_setup()

import numpy as np

STAGES = ["null", "encode", "+warp/fuse", "+decode", "+heads+loss"]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--com", type=str, default="disco")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--grid", type=int, default=256)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--max_pos", type=int, default=0,
                   help="config.max_pos_anchors override (0 = config default), "
                        "matching the train CLI's --max_pos")
    p.add_argument("--table_cap_gib", type=float, default=4.0,
                   help="HBM budget for the --kd gather-table variant. At "
                        "256-grid the full per-frame table exceeds HBM (the "
                        "reason 256 cells run the reforward path); the table "
                        "is row-capped to this budget and frame_idx wrapped — "
                        "per-step gather cost is row-count-independent (B row "
                        "DMAs either way), so the attribution is unchanged")
    p.add_argument("--kd", type=int, default=0,
                   help="KD-step attribution instead of the prefix rows "
                        "(VERDICT r4 weak #4): where does the KD-cached step's "
                        "cost over the plain step go? Times the SAME student "
                        "under (a) KD off, (b) KD MSE against a 1-row zero "
                        "cache (gather ~free -> isolates the MSE + tap-grad "
                        "cost), (c) the full per-frame-table gather, plus a "
                        "gather-only microbench of the B dynamic-slice DMAs")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from disconet_tpu.config import Config, tiny_config
    from disconet_tpu.data import BatchIterator, V2XSimDet
    from disconet_tpu.models import build_model
    from disconet_tpu.models.base import agents_to_batch, batch_to_agents, warp_all_pairs
    from disconet_tpu.training import batch_to_device, create_train_state
    from disconet_tpu.training.det_module import _losses, get_bev

    over = {"max_pos_anchors": args.max_pos} if args.max_pos else {}
    cfg = Config(**over) if args.grid == 256 else tiny_config(args.grid, **over)
    dataset = V2XSimDet(args.data, cfg, rsu=True, dense_targets=False, cache_items=64)
    loader = BatchIterator(dataset, args.batch, shuffle=True, seed=0, num_workers=0)
    host_batch = next(iter(loader))
    if args.kd:
        return kd_attribution(args, cfg, dataset, host_batch)
    batch = batch_to_device(host_batch)
    jax.block_until_ready(batch)

    model = build_model(args.com, cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), host_batch)
    state = jax.device_put(state)
    params, batch_stats = state.params, state.batch_stats

    def checksum(*arrays):
        return sum(jnp.sum(a.astype(jnp.float32)) for a in arrays)

    # ONE prefix body for both BN modes (train flag threaded through) —
    # same submodule calls as IntermediateFusionModel.__call__ (models/base.py),
    # so the fwd(eBN) row cannot silently measure a different graph
    def run_prefix(m, bev, trans, mask, upto, train=True):
        B, A = bev.shape[0], bev.shape[1]
        x = agents_to_batch(bev)
        feats = m.stpn.encode(x, train)
        if upto == 1:
            return checksum(feats[-1])
        k = model.layer
        fk = batch_to_agents(feats[k], B, A)
        warped = warp_all_pairs(fk, trans, cfg.area_extents[:2])
        fused = m.fuse(fk, warped, mask, train, trans=trans)
        if upto == 2:
            return checksum(fused)
        feats = list(feats)
        feats[k] = agents_to_batch(fused)
        head_in, _ = m.stpn.decode(feats, train)
        if upto == 3:
            return checksum(head_in)
        cls, reg, _, raw_f32 = m.heads(head_in)
        out = {
            "cls": cls.reshape((B, A) + cls.shape[1:]),
            "reg": reg.reshape((B, A) + reg.shape[1:]),
            "head_raw_f32": raw_f32.reshape((B, A) + raw_f32.shape[1:]),
        }
        loss, _ = _losses(out, batch, cfg)
        return loss

    def prefix(p, bs, upto):
        if upto == 0:  # dispatch + fetch floor
            return checksum(batch["agent_mask"]), bs
        out, mut = model.apply(
            {"params": p, "batch_stats": bs},
            get_bev(batch, "bev", cfg),
            batch["trans"],
            batch["agent_mask"],
            method=functools.partial(run_prefix, upto=upto),
            mutable=["batch_stats"],
        )
        return out, mut["batch_stats"]

    def fwd_only(p, bs, upto):
        val, new_bs = prefix(p, bs, upto)
        return val + 0.0 * optax.global_norm(jax.tree.leaves(new_bs))

    # eval-mode BN row (use_running_average=True): the fwd delta vs
    # train-mode isolates what batch statistics cost — in train mode the
    # per-conv mean/var reductions block XLA from folding BN+ReLU into the
    # conv epilogue
    def fwd_eval_bn(p, bs, upto):
        if upto == 0:
            return checksum(batch["agent_mask"])
        return model.apply(
            {"params": p, "batch_stats": bs},
            get_bev(batch, "bev", cfg),
            batch["trans"],
            batch["agent_mask"],
            method=functools.partial(run_prefix, upto=upto, train=False),
        )

    def fwd_bwd(p, bs, upto):
        (val, _), grads = jax.value_and_grad(
            lambda pp: prefix(pp, bs, upto), has_aux=True
        )(p)
        # keep every gradient live — returning val alone would let XLA erase
        # the entire backward pass
        return val + 0.0 * optax.global_norm(grads)

    roofline = bool(os.environ.get("ROOFLINE"))

    def time_row(make_fn):
        cum, cost = [], []
        for upto in range(len(STAGES)):
            fn = jax.jit(functools.partial(make_fn, upto=upto))
            if roofline:
                compiled = fn.lower(params, batch_stats).compile()
                ca = compiled.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                cost.append((float(ca.get("flops", 0.0)),
                             float(ca.get("bytes accessed", 0.0))))
                fn = compiled
            for _ in range(args.warmup):
                float(fn(params, batch_stats))
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = fn(params, batch_stats)
            float(out)  # FIFO: syncs all steps
            cum.append((time.perf_counter() - t0) / args.steps)
        return cum, cost

    print(f"com={args.com} grid={args.grid} batch={args.batch} "
          f"({args.batch * cfg.max_agents} agent-frames)", flush=True)
    cum_e, _ = time_row(fwd_eval_bn)
    cum_f, cost_f = time_row(fwd_only)
    cum_b, cost_b = time_row(fwd_bwd)

    hdr = (f"{'stage':>14} | {'fwd(eBN)':>8} | {'fwd ms':>8} | {'fwd+bwd':>8} "
           f"| {'bwd ms':>8}")
    if roofline:
        hdr += f" | {'GFLOP(fb)':>9} | {'GB(fb)':>7}"
    print("\n" + hdr)
    print("-" * len(hdr))
    report = {}
    pe = pf = pb = 0.0
    for i, name in enumerate(STAGES):
        e_ms = (cum_e[i] - pe) * 1e3
        f_ms = (cum_f[i] - pf) * 1e3
        b_ms = (cum_b[i] - pb) * 1e3
        row = (f"{name:>14} | {e_ms:8.2f} | {f_ms:8.2f} | {b_ms:8.2f} "
               f"| {b_ms - f_ms:8.2f}")
        if roofline:
            gflop = (cost_b[i][0] - (cost_b[i - 1][0] if i else 0.0)) / 1e9
            gb = (cost_b[i][1] - (cost_b[i - 1][1] if i else 0.0)) / 1e9
            row += f" | {gflop:9.1f} | {gb:7.2f}"
        print(row, flush=True)
        report[name] = {"fwd_eval_bn_ms": round(e_ms, 2),
                        "fwd_ms": round(f_ms, 2), "fwd_bwd_ms": round(b_ms, 2)}
        pe, pf, pb = cum_e[i], cum_f[i], cum_b[i]
    report["total_fwd_eval_bn_ms"] = round(cum_e[-1] * 1e3, 2)
    report["total_fwd_ms"] = round(cum_f[-1] * 1e3, 2)
    report["total_fwd_bwd_ms"] = round(cum_b[-1] * 1e3, 2)
    report["scenes_per_sec_fwd_bwd"] = round(args.batch / cum_b[-1], 1)
    print(json.dumps(report))


def kd_attribution(args, cfg, dataset, host_batch):
    """--kd 1: attribute the KD-cached train step's cost over the plain step.

    Round-4 measured the e2e gap (45.4 -> 38.6 scenes/s with --max_pos 1024)
    but not where it goes (VERDICT r4 weak #4). Three timed variants of the
    SAME kd-capable student (identical params; with KD off the unused tap
    outputs are dead code XLA eliminates):

      plain      make_train_step(kd_flag=False)
      kd_mse     kd_from_cache against a 1-row zero table (frame_idx forced 0:
                 the gather is one cache-resident row -> ~free), so the delta
                 vs plain is the KD MSE + the extra backward through the taps
      kd_gather  the cached production path: per-frame bf16 tables sized like
                 precompute_teacher_feats' (ceil(n/b)*b rows), real frame_idx;
                 delta vs kd_mse is the HBM table-gather cost
      kd_reforward  the UNcached production path (a frozen TeacherNet forward
                 every step + the bev_teacher host transfer) — what the
                 256-grid quality cells actually run, since their table would
                 be 26 GiB > HBM; delta vs kd_mse is the teacher recompute

    plus a gather-only jit (B dynamic-slice row DMAs per tap table) as the
    microbench cross-check. Timing protocol is bench.py's scalar-fetch sync.
    """
    import jax
    import jax.numpy as jnp

    from disconet_tpu.models import build_model
    from disconet_tpu.training import batch_to_device, create_train_state
    from disconet_tpu.training.det_module import get_bev, make_train_step

    model = build_model(args.com, cfg, kd_flag=True)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), host_batch)
    host_state = jax.device_get(state)

    # mimic the train CLI's cached-KD batch surface (bev_teacher dropped);
    # the reforward variant keeps the full batch incl. bev_teacher
    host_full = dict(host_batch)
    host_batch = dict(host_batch)
    host_batch.pop("bev_teacher", None)
    host_batch.pop("bev_teacher_packed", None)
    batch = batch_to_device(host_batch)
    full_batch = batch_to_device(host_full)
    jax.block_until_ready(batch)
    B = int(batch["frame_idx"].shape[0])

    # KD tap shapes without compiling anything: eval_shape the student forward
    out_sds = jax.eval_shape(
        lambda p, bs: model.apply(
            {"params": p, "batch_stats": bs}, get_bev(batch, "bev", cfg),
            batch["trans"], batch["agent_mask"], train=False),
        host_state.params, host_state.batch_stats)
    tap_shapes = [tuple(f.shape[1:]) for f in out_sds["kd_feats"]]
    n_rows = -(-len(dataset) // args.batch) * args.batch  # ceil to batch mult
    # size the full per-frame table BEFORE allocating: at 256-grid it does
    # not fit (the very reason the 256 cells run the reforward path); cap the
    # rows so table + train-step working set stay inside HBM, and report the
    # per-row gather cost from the capped table (row DMA cost is
    # row-count-independent — each step touches B rows wherever they live)
    import math as _math

    row_bytes = sum(2 * _math.prod(s) for s in tap_shapes)
    full_gib = row_bytes * n_rows / 2**30
    cap_rows = min(n_rows, max(args.batch, int(args.table_cap_gib * 2**30
                                               // max(1, row_bytes))))
    # allocated ON device (values are irrelevant to DMA/MSE cost; a host
    # random table would ship GiBs over the tunnel for nothing)
    tables = tuple(jnp.zeros((cap_rows,) + s, jnp.bfloat16) for s in tap_shapes)
    zero_tables = tuple(jnp.zeros((1,) + s, jnp.bfloat16) for s in tap_shapes)
    table_gib = row_bytes * cap_rows / 2**30
    jax.block_until_ready(tables)
    print(f"com={args.com} grid={args.grid} batch={B} P={cfg.max_pos_anchors} "
          f"taps={tap_shapes} table={table_gib:.2f} GiB ({cap_rows} rows"
          + (f"; full {n_rows}-row table would be {full_gib:.2f} GiB"
             if cap_rows < n_rows else "") + ")", flush=True)
    if cap_rows < n_rows:
        # keep frame_idx in range of the capped table
        batch = {**batch, "frame_idx": batch["frame_idx"] % cap_rows}

    from disconet_tpu.models import TeacherNet
    from disconet_tpu.training.det_module import get_bev_np

    teacher = TeacherNet(config=cfg)
    teacher_vars = jax.jit(functools.partial(teacher.init, train=False))(
        jax.random.PRNGKey(1), get_bev_np(host_full, "bev_teacher", cfg),
        None, host_full["agent_mask"])

    zero_idx_batch = {**batch, "frame_idx": jnp.zeros_like(batch["frame_idx"])}
    variants = [
        ("plain", make_train_step(model, cfg, kd_flag=False), batch, None),
        ("kd_mse", make_train_step(model, cfg, kd_flag=True, kd_from_cache=True),
         zero_idx_batch, zero_tables),
        ("kd_gather", make_train_step(model, cfg, kd_flag=True, kd_from_cache=True),
         batch, tables),
        ("kd_reforward",
         make_train_step(model, cfg, teacher=teacher, kd_flag=True,
                         kd_from_cache=False),
         full_batch, teacher_vars),
    ]
    report = {"table_gib": round(table_gib, 2), "n_rows": n_rows,
              "cap_rows": cap_rows, "full_table_gib": round(full_gib, 2),
              "P": cfg.max_pos_anchors}
    times = {}
    for name, step, b, tv in variants:
        st = jax.device_put(host_state)  # fresh state: the step donates it
        for _ in range(args.warmup):
            st, metrics = step(st, b, tv)
            float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            st, metrics = step(st, b, tv)
        float(metrics["loss"])  # FIFO: syncs all steps
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        times[name] = ms
        print(f"{name:>10}: {ms:8.2f} ms/step  "
              f"({args.batch / ms * 1e3:6.1f} scenes/s)", flush=True)
        report[f"{name}_ms"] = round(ms, 2)

    @jax.jit
    def gather_only(tables, idx):
        acc = jnp.float32(0)
        for f in tables:
            rows = jnp.stack(
                [jax.lax.dynamic_index_in_dim(f, idx[i], 0, keepdims=False)
                 for i in range(B)])
            acc = acc + jnp.sum(rows.astype(jnp.float32))
        return acc

    for _ in range(args.warmup):
        float(gather_only(tables, batch["frame_idx"].astype(jnp.int32)))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = gather_only(tables, batch["frame_idx"].astype(jnp.int32))
    float(out)
    g_ms = (time.perf_counter() - t0) / args.steps * 1e3
    print(f"{'gather-only':>10}: {g_ms:8.2f} ms ({B} rows x {len(tables)} taps)",
          flush=True)
    report["gather_only_ms"] = round(g_ms, 2)
    report["kd_mse_minus_plain_ms"] = round(times["kd_mse"] - times["plain"], 2)
    report["gather_minus_mse_ms"] = round(times["kd_gather"] - times["kd_mse"], 2)
    report["reforward_minus_mse_ms"] = round(
        times["kd_reforward"] - times["kd_mse"], 2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
