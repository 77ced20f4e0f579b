#!/usr/bin/env python
"""Evaluate BEV segmentation: per-class IoU + mIoU (SURVEY.md C21/C24)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from disconet_tpu.utils.env import setup as _env_setup

_env_setup()  # compile cache + honor JAX_PLATFORMS over sitecustomize override

import jax
import numpy as np

from disconet_tpu.config import Config, default_fusion_layer, tiny_config
from disconet_tpu.data import BatchIterator, V2XSimSeg
from disconet_tpu.models import build_model
from disconet_tpu.training import batch_to_device
from disconet_tpu.training.seg_module import (
    create_seg_train_state,
    iou_per_class,
    make_seg_predict_step,
)

CLASS_NAMES = ["background", "vehicle", "road", "terrain", "sidewalk", "building", "pedestrian", "vegetation"]


def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate TPU-native BEV segmentation")
    p.add_argument("--data", required=True)
    p.add_argument("--com", type=str, default="")
    p.add_argument("--bound", type=str, default="")
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--rsu", type=int, default=1)
    p.add_argument("--layer", type=int, default=None,
                   help="fusion layer index (default: config.default_fusion_layer; "
                        "must match the checkpoint's training value — a checkpoint "
                        "trained under the old fixed default needs an explicit "
                        "--layer 3 or restore fails on fusion_channels shape)")
    p.add_argument("--seg_backbone", type=str, default="unet", choices=["unet", "stpn"],
                   help="seg architecture (SURVEY.md C19): reference-topology UNet "
                        "or the det STPN pyramid + 1x1 SegHead (A/B in BASELINE.md)")
    p.add_argument("--grid", type=int, default=256)
    p.add_argument("--visualization", type=int, default=0,
                   help="render pred-vs-gt seg panels for the first batch")
    p.add_argument("--logpath", type=str, default="logs", help="--visualization output dir")
    args = p.parse_args(argv)
    if args.layer is None:
        args.layer = default_fusion_layer(args.grid)
        if args.layer != 3:  # same notice as det's CLIs (ADVICE r3): a silent
            # resolution makes the checkpoint-shape mismatch error confusing
            print(f"--layer auto: {args.layer} (fusion map >=16x16 at "
                  f"--grid {args.grid}; pass --layer 3 for the reference index "
                  f"/ checkpoints trained under the old fixed default)")

    over = dict(fusion_layer=args.layer, seg_backbone=args.seg_backbone)
    cfg = Config(**over) if args.grid == 256 else tiny_config(args.grid, **over)
    dataset = V2XSimSeg(args.data, cfg, rsu=bool(args.rsu), bound=args.bound)
    if len(dataset) == 0:
        raise SystemExit(f"no frames under {args.data}")
    loader = BatchIterator(dataset, args.batch, shuffle=False, drop_last=False)

    model = build_model(args.com or args.bound, cfg, layer=args.layer, task="seg")
    from disconet_tpu.data.dataset import collate_det

    state = create_seg_train_state(model, cfg, jax.random.PRNGKey(0), collate_det([dataset[0]]))
    if args.resume:
        from disconet_tpu.training.checkpoint import restore_or_die

        state, e, resolved = restore_or_die(args.resume, state)
        print(f"loaded epoch {e} from {resolved}")
    else:
        print("WARNING: evaluating a randomly initialized model")

    predict = make_seg_predict_step(model, cfg)

    from disconet_tpu.data.dataset import pad_batch_to

    def prepared_batches():
        for batch in loader:
            yield pad_batch_to(batch, args.batch, cfg.max_agents)

    from disconet_tpu.training.det_module import pipeline_one_deep

    predictions = pipeline_one_deep(  # dispatch batch n+1 before fetching batch n
        prepared_batches(),
        lambda b: predict(state, batch_to_device(b)),
        fetch=lambda fut: np.asarray(jax.device_get(fut)),
    )

    preds, labels, masks = [], [], []
    vis_done = False
    for batch, pr in predictions:
        m = batch["agent_mask"][:, :, None, None]  # padded rows are all-False → excluded
        preds.append(pr)
        labels.append(batch["seg_label"])
        masks.append(np.broadcast_to(m, pr.shape))
        if args.visualization and not vis_done:
            _render_seg_batch(args, cfg, batch, pr)
            vis_done = True

    res = iou_per_class(np.concatenate(preds), np.concatenate(labels),
                        cfg.num_seg_classes, mask=np.concatenate(masks))
    print(f"\n{'class':>12} | IoU")
    print("-" * 22)
    for c, v in res["iou"].items():
        name = CLASS_NAMES[c] if c < len(CLASS_NAMES) else str(c)
        print(f"{name:>12} | {v:.4f}" if v == v else f"{name:>12} |    n/a")
    print("-" * 22)
    print(f"{'mIoU':>12} | {res['miou']:.4f}")
    return res


def _render_seg_batch(args, cfg, batch, pr):
    """Pred-vs-gt colored seg panels for the first batch's first scene-frame,
    one png per present agent (reference seg tooling's qualitative output)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from disconet_tpu.utils.visualization import render_seg

    out_dir = os.path.join(args.logpath, "vis")
    os.makedirs(out_dir, exist_ok=True)
    b = 0
    scene, frame = (int(x) for x in batch["scene_frame"][b])
    for a in np.flatnonzero(np.asarray(batch["agent_mask"][b]).astype(bool)):
        fig = render_seg(pr[b, a], batch["seg_label"][b, a],
                         num_classes=cfg.num_seg_classes, class_names=CLASS_NAMES)
        fig.savefig(os.path.join(out_dir, f"seg_s{scene}_f{frame}_a{a}.png"), dpi=100)
        plt.close(fig)


if __name__ == "__main__":
    main()
