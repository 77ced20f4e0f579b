#!/usr/bin/env python
"""Training-throughput attribution (SURVEY.md §5.2 profiling aid).

Splits the training loop of tools/det/train_codet.py into its three
overlappable phases and times each in isolation:

  * host:   dataset item load + batch assembly (BatchIterator pass, no device)
  * xfer:   host->device transfer (batch_to_device + block on the arrays)
  * device: jitted train_step on a resident batch (FIFO-sync at the end)
  * e2e:    the real pipelined loop (prefetch_to_device + train_step)

Because transfers and the device step overlap in the real loop, e2e should
approach max(host, xfer, device) per batch; the gap is pipeline slack.

Usage: python tools/bench_train.py --data /tmp/v2x_train256/train [--kd_flag 1]
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



def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--com", type=str, default="disco")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--kd_flag", type=int, default=0)
    p.add_argument("--kd_cache", type=int, default=0,
                   help="with --kd_flag 1: precompute teacher features into HBM "
                        "(train_codet.py --kd_cache path) instead of re-forwarding "
                        "the teacher every step")
    p.add_argument("--grid", type=int, default=256)
    p.add_argument("--nworker", type=int, default=2)
    p.add_argument("--steps", type=int, default=10, help="timed steps per phase")
    p.add_argument("--remat", type=int, default=0,
                   help="config.train_remat: rematerialize intra-stage "
                        "activations in the backward pass")
    p.add_argument("--max_pos", type=int, default=0,
                   help="override config.max_pos_anchors (P): the packed "
                        "loss gathers/scatters P sites per agent-frame, so "
                        "P sizes that cost directly (train-step roofline)")
    p.add_argument("--packed_loss", type=int, default=1,
                   help="0 = view-based loss path (the pre-r3 baseline)")
    args = p.parse_args(argv)

    import jax

    from disconet_tpu.config import Config, tiny_config
    from disconet_tpu.data import BatchIterator, V2XSimDet
    from disconet_tpu.models import TeacherNet, build_model
    from disconet_tpu.training import (
        batch_to_device,
        create_train_state,
        make_train_step,
        prefetch_to_device,
    )

    over = {"train_remat": True} if args.remat else {}
    if args.max_pos:
        over["max_pos_anchors"] = args.max_pos
    if not args.packed_loss:
        over["packed_loss"] = False
    cfg = Config(**over) if args.grid == 256 else tiny_config(args.grid, **over)
    dataset = V2XSimDet(args.data, cfg, rsu=True, dense_targets=False, cache_items=512)
    loader = BatchIterator(dataset, args.batch, shuffle=True, seed=0, num_workers=args.nworker)
    print(f"dataset: {len(dataset)} frames, {len(loader)} batches/epoch", flush=True)

    model = build_model(args.com, cfg, kd_flag=bool(args.kd_flag))
    sample = next(iter(BatchIterator(dataset, args.batch, shuffle=False)))
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), sample)
    teacher = teacher_vars = None
    if args.kd_flag:
        from disconet_tpu.training.det_module import get_bev_np

        teacher = TeacherNet(config=cfg)
        teacher_vars = teacher.init(
            jax.random.PRNGKey(1), get_bev_np(sample, "bev_teacher", cfg), None,
            sample["agent_mask"], train=False,
        )
    kd_cache = bool(args.kd_flag and args.kd_cache)
    if kd_cache:
        from disconet_tpu.training.det_module import precompute_teacher_feats

        t0 = time.perf_counter()
        teacher_vars = precompute_teacher_feats(
            teacher, teacher_vars, dataset, cfg, batch_size=args.batch,
            num_workers=args.nworker,
        )
        print(f"KD cache precomputed in {time.perf_counter() - t0:.1f}s", flush=True)
    train_step = make_train_step(model, cfg, teacher=teacher,
                                 kd_flag=bool(args.kd_flag), kd_from_cache=kd_cache)

    def host_batches(n):
        it, got = iter(loader), 0
        while got < n:
            for b in it:
                if not args.kd_flag or kd_cache:
                    b.pop("bev_teacher", None)
                    b.pop("bev_teacher_packed", None)
                yield b
                got += 1
                if got >= n:
                    return
            it = iter(loader)

    n = args.steps
    report = {"batch": args.batch, "com": args.com, "kd": args.kd_flag,
              "kd_cache": int(kd_cache)}

    # warm the item cache + compile first so phases time steady state; the
    # host phase must see the same warm cache e2e does, so pre-walk the same
    # n batches it will time (V2XSimDet cache_items holds the .npy items)
    warm = next(host_batches(1).__iter__())
    dev_warm = batch_to_device(warm)
    state, m = train_step(state, dev_warm, teacher_vars)
    float(m["loss"])
    for _ in host_batches(n):
        pass

    # host: batch assembly only
    t0 = time.perf_counter()
    for b in host_batches(n):
        pass
    report["host_ms"] = (time.perf_counter() - t0) / n * 1e3

    # xfer: host->device (reuses one host batch: IO excluded). block_until_ready
    # acks before remote completion over the axon tunnel (CLAUDE.md), so sync by
    # fetching one element of every array — the slice executes after the
    # transfer it depends on.
    t0 = time.perf_counter()
    for _ in range(n):
        d = batch_to_device(warm)
        for x in jax.tree_util.tree_leaves(d):
            float(x.reshape(-1)[0].astype("float32"))
    report["xfer_ms"] = (time.perf_counter() - t0) / n * 1e3

    # device: resident batch, FIFO sync once at the end
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = train_step(state, dev_warm, teacher_vars)
    float(metrics["loss"])
    report["device_ms"] = (time.perf_counter() - t0) / n * 1e3

    # e2e: the real pipelined loop
    t0 = time.perf_counter()
    for dev_batch in prefetch_to_device(host_batches(n), batch_to_device):
        state, metrics = train_step(state, dev_batch, teacher_vars)
    float(metrics["loss"])
    report["e2e_ms"] = (time.perf_counter() - t0) / n * 1e3
    report["scenes_per_sec"] = round(args.batch / (report["e2e_ms"] / 1e3), 1)
    report = {k: (round(v, 2) if isinstance(v, float) else v) for k, v in report.items()}
    print(json.dumps(report))


if __name__ == "__main__":
    main()
