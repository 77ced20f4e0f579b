#!/usr/bin/env python
"""Train BEV semantic segmentation (SURVEY.md C24; README.md:42-50: the same
train/test commands run inside tools/seg). Shares the det CLI flag surface."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from disconet_tpu.utils.env import setup as _env_setup

_env_setup()  # compile cache + honor JAX_PLATFORMS over sitecustomize override
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import numpy as np

from disconet_tpu.config import Config, default_fusion_layer, tiny_config
from disconet_tpu.data import BatchIterator, V2XSimSeg
from disconet_tpu.models import build_model
from disconet_tpu.training import CheckpointIO, MetricLogger
from disconet_tpu.training.seg_module import create_seg_train_state, make_seg_train_step


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train TPU-native collaborative BEV segmentation")
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--com", type=str, default="")
    p.add_argument("--bound", type=str, default="")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--nepoch", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--layer", type=int, default=None,
                   help="fusion layer index (default: config.default_fusion_layer; "
                        "resuming a checkpoint requires the value it was "
                        "trained with)")
    p.add_argument("--seg_backbone", type=str, default="unet", choices=["unet", "stpn"],
                   help="seg architecture (SURVEY.md C19): reference-topology UNet "
                        "or the det STPN pyramid + 1x1 SegHead (A/B in BASELINE.md)")
    p.add_argument("--rsu", type=int, default=1)
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--auto_resume_path", type=str, default="")
    p.add_argument("--logpath", type=str, default="logs_seg")
    p.add_argument("--log", action="store_true")
    p.add_argument("--nworker", type=int, default=2)
    p.add_argument("--grid", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--remat", type=int, default=0,
                   help="config.train_remat: rematerialize intra-stage "
                        "activations in the backward pass")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="optimizer steps per device call (lax.scan over K "
                        "stacked batches) — hides the tunnel round trip on "
                        "small grids; semantics = K sequential steps")
    p.add_argument("--ckpt_every", type=int, default=1, help="save checkpoints every N epochs")
    p.add_argument("--ckpt_keep", type=int, default=5,
                   help="orbax checkpoints retained (0 = keep all)")
    args = p.parse_args(argv)
    if args.layer is None:
        args.layer = default_fusion_layer(args.grid)
        if args.layer != 3:  # notice matches det's CLIs (ADVICE r3)
            print(f"--layer auto: {args.layer} (fusion map >=16x16 at "
                  f"--grid {args.grid}; pass --layer 3 for the reference index)")
    return args


def main(argv=None):
    args = parse_args(argv)
    over = dict(fusion_layer=args.layer, seg_backbone=args.seg_backbone)
    if args.remat:
        over["train_remat"] = True
    cfg = Config(**over) if args.grid == 256 else tiny_config(args.grid, **over)

    dataset = V2XSimSeg(args.data, cfg, rsu=bool(args.rsu), bound=args.bound, cache_items=256)
    if len(dataset) == 0:
        raise SystemExit(f"no frames under {args.data}")
    loader = BatchIterator(dataset, args.batch, shuffle=True, seed=args.seed, num_workers=args.nworker)
    print(f"dataset: {len(dataset)} scene-frames, {len(loader)} batches/epoch")

    model = build_model(args.com or args.bound, cfg, layer=args.layer, task="seg")
    sample = next(iter(BatchIterator(dataset, args.batch, shuffle=False)))
    state = create_seg_train_state(model, cfg, jax.random.PRNGKey(args.seed), sample, lr=args.lr)

    mode = (args.com or args.bound or "lowerbound") + "_seg"
    logdir = os.path.join(args.logpath, mode)
    ckpt_io = CheckpointIO(os.path.join(logdir, "ckpt"), max_to_keep=args.ckpt_keep or None)
    start_epoch = 0
    if args.resume:
        from disconet_tpu.training.checkpoint import restore_or_die

        state, start_epoch, _ = restore_or_die(args.resume, state)
    elif args.auto_resume_path:
        auto = os.path.join(args.auto_resume_path, mode, "ckpt")
        if os.path.isdir(auto):
            state, e = CheckpointIO(auto).restore(state)
            start_epoch = e or 0

    logger = MetricLogger(logdir, log=args.log)
    K = max(1, args.steps_per_dispatch)
    if K > 1:
        from disconet_tpu.training.seg_module import make_seg_train_step_multi

        train_step = make_seg_train_step_multi(model, cfg)
    else:
        train_step = make_seg_train_step(model, cfg)
    from disconet_tpu.training import batch_to_device, stack_host_batches

    def host_groups():
        if K == 1:
            yield from loader
            return
        group = []
        for b in loader:
            group.append(b)
            if len(group) == K:
                yield stack_host_batches(group)
                group = []
        if group:  # epoch tail: shorter scan, one extra compile
            yield stack_host_batches(group)

    def _floats(metrics):
        # multi-step dispatch stacks per-step values; log the last step's
        return {k: float(np.asarray(v).reshape(-1)[-1]) for k, v in metrics.items()}

    step = 0
    for epoch in range(start_epoch + 1, args.nepoch + 1):
        t0 = time.time()
        for batch in host_groups():
            dev = batch_to_device(batch)  # ships seg_label + bit-packed bev
            state, metrics = train_step(state, dev)
            step += (next(iter(dev.values())).shape[0] if K > 1 else 1)
            if step % args.log_every == 0:
                logger.write(step, _floats(metrics), prefix=f"epoch {epoch}")
        logger.write(step, {**_floats(metrics),
                            "scenes_per_sec": len(loader) * args.batch / (time.time() - t0)},
                     prefix=f"epoch {epoch} done")
        if epoch % args.ckpt_every == 0 or epoch == args.nepoch:
            ckpt_io.save(epoch, jax.device_get(state))
    logger.close()
    print(f"seg training complete, checkpoints in {logdir}")


if __name__ == "__main__":
    main()
