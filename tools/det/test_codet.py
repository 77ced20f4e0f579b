#!/usr/bin/env python
"""Evaluate collaborative detection (SURVEY.md C23, reference tools/det/test_codet.py).

Flag surface preserved (README.md:68-76):

    python test_codet.py --data <root> --com disco --resume <ckpt> \
        --rsu 0 [--tracking] [--visualization 1] --logpath logs

Prints mAP@0.5 / mAP@0.7 per agent and overall (same table layout as the
reference so output-scraping scripts keep working). ``--tracking`` dumps
per-agent per-scene detection files for tools/track/sort.py; ``--visualization``
renders BEV pngs under ``{logpath}/vis``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from disconet_tpu.utils.env import setup as _env_setup

_env_setup()  # compile cache + honor JAX_PLATFORMS over sitecustomize override
from collections import defaultdict

import jax
import numpy as np

from disconet_tpu.config import Config, default_fusion_layer, tiny_config
from disconet_tpu.data import BatchIterator, V2XSimDet
from disconet_tpu.evaluation import eval_map
from disconet_tpu.models import build_model
from disconet_tpu.training import batch_to_device, create_train_state, make_predict_step
from disconet_tpu.training.checkpoint import load_pth, restore_or_die


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate TPU-native collaborative detection")
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--com", type=str, default="")
    p.add_argument("--bound", type=str, default="")
    p.add_argument("--resume", type=str, default="", help=".pth or orbax dir")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--rsu", type=int, default=1)
    p.add_argument("--tracking", action="store_true", help="dump MOT-style det files")
    p.add_argument("--split", type=str, default="test",
                   help="split label for the tracking-dump directory layout "
                        "({logpath}/{mode}/{no_rsu|with_rsu}/{split}/det_dumps, "
                        "README.md:86-91 Makefile convention)")
    p.add_argument("--apply_late_fusion", type=int, default=0,
                   help="late collaboration: merge neighbors' boxes into each agent (C8)")
    p.add_argument("--logpath", type=str, default="logs")
    p.add_argument("--visualization", type=int, default=0)
    p.add_argument("--layer", type=int, default=None,
                   help="fusion layer index (default: config.default_fusion_layer "
                        "for --grid; must match the checkpoint's training value)")
    p.add_argument("--warp_flag", type=int, default=1)
    p.add_argument("--grid", type=int, default=256)
    p.add_argument("--num_classes", type=int, default=2,
                   help="detection classes incl. background; >2 runs per-class "
                        "NMS and prints a per-class AP table (must match the "
                        "checkpoint's training value)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--score_threshold", type=float, default=None,
                   help="override config score threshold (default 0.3)")
    p.add_argument("--pose_noise_std", type=float, default=0.0,
                   help="test-time pose noise: translation std [m] (paper robustness study)")
    p.add_argument("--warp_dtype", type=str, default=None, choices=["bfloat16", "float32"],
                   help="inference warp dtype override (config.warp_dtype)")
    p.add_argument("--pose_noise_rot_std", type=float, default=0.0,
                   help="test-time pose noise: rotation std [rad]")
    p.add_argument("--gru_rounds", type=int, default=0,
                   help="--com v2v only: ConvGRU rounds (0 = model default 3); "
                        "must match the checkpoint's training value")
    args = p.parse_args(argv)
    if args.layer is None:
        args.layer = default_fusion_layer(args.grid)
        if args.layer != 3:
            print(f"--layer auto: {args.layer} (fusion map >=16x16 at "
                  f"--grid {args.grid}; pass --layer 3 for the reference index)")
    return args


def main(argv=None):
    args = parse_args(argv)
    over = {"fusion_layer": args.layer}
    if args.num_classes != 2:
        over["num_classes"] = args.num_classes
    if args.score_threshold is not None:
        over["score_threshold"] = args.score_threshold
    if args.warp_dtype:
        over["warp_dtype"] = args.warp_dtype
    cfg = Config(**over) if args.grid == 256 else tiny_config(args.grid, **over)

    dataset = V2XSimDet(args.data, cfg, rsu=bool(args.rsu), bound=args.bound,
                        dense_targets=False, cache_items=64)
    if len(dataset) == 0:
        raise SystemExit(f"no frames found under {args.data}")
    loader = BatchIterator(dataset, args.batch, shuffle=False, drop_last=False)

    model = build_model(args.com or args.bound, cfg, kd_flag=False,
                        layer=args.layer, warp_flag=bool(args.warp_flag),
                        gru_rounds=args.gru_rounds)
    sample = dataset[0]
    from disconet_tpu.data.dataset import collate_det

    state = create_train_state(model, cfg, jax.random.PRNGKey(args.seed), collate_det([sample]))
    if args.resume:
        if args.resume.endswith(".pth"):
            params, stats, epoch, _ = load_pth(args.resume, state.params, state.batch_stats)
            state = state.replace(params=params, batch_stats=stats)
            resolved = args.resume
        else:
            state, epoch, resolved = restore_or_die(args.resume, state)
        print(f"loaded checkpoint from {resolved} (epoch {epoch})")
    else:
        print("WARNING: evaluating a randomly initialized model (--resume not given)")

    predict = make_predict_step(model, cfg)

    # per-agent accumulators: agent slot -> list of (boxes, scores) / gt
    dets = defaultdict(list)
    gts = defaultdict(list)
    track_rows = defaultdict(list)  # (agent, scene) -> rows

    from disconet_tpu.data.dataset import pad_batch_to

    noise_rng = np.random.default_rng(args.seed)  # local: reruns of main() reproduce

    def prepared_batches():
        for batch in loader:
            pad_batch_to(batch, args.batch, cfg.max_agents)
            if args.pose_noise_std > 0 or args.pose_noise_rot_std > 0:
                from disconet_tpu.utils.pose_noise import perturb_trans

                batch["trans"] = perturb_trans(
                    batch["trans"], args.pose_noise_std, args.pose_noise_rot_std, noise_rng
                )
            yield batch

    from disconet_tpu.training.det_module import pipeline_one_deep, prefetch_to_device

    # three-way overlap: host->device transfers run on prefetch_to_device's
    # worker thread (device_put holds its calling thread for the full tunnel
    # wire time), batch n+1's predict is dispatched before batch n's outputs
    # are fetched, and the host processes mAP/late-fusion/tracking meanwhile.
    # The host batch rides along so the loop below never fetches small arrays
    # (gt_boxes, agent_mask, scene_frame) back across the tunnel.
    pairs = prefetch_to_device(
        prepared_batches(), to_device=lambda b: (b, batch_to_device(b))
    )
    predictions = pipeline_one_deep(pairs, lambda hb_db: predict(state, hb_db[1]))

    multiclass = cfg.num_classes > 2
    if multiclass and args.apply_late_fusion:
        raise SystemExit("--apply_late_fusion is binary-only (class labels "
                         "would not survive the cross-agent merge)")

    n_frames = 0
    edge_dumped = False
    for (batch, dev_batch), pred in predictions:
        # multi-class predict returns a 4th element: per-box class labels
        (boxes, scores, keep), labels = pred[:3], (pred[3] if multiclass else None)
        if args.visualization and args.com == "disco" and not edge_dumped:
            _render_edge_weights(args, cfg, model, state, batch, dev_batch)
            edge_dumped = True
        B = int(np.sum(np.any(batch["agent_mask"], axis=1)))
        for b in range(B):
            scene, frame = (int(x) for x in batch["scene_frame"][b])
            if args.apply_late_fusion:
                from disconet_tpu.ops.late_fusion import late_fusion

                raw = [
                    (boxes[b, a][keep[b, a]], scores[b, a][keep[b, a]])
                    for a in range(cfg.max_agents)
                ]
            for a in range(cfg.max_agents):
                if not batch["agent_mask"][b, a]:
                    continue
                if args.apply_late_fusion:
                    d_boxes, d_scores = late_fusion(
                        raw, batch["trans"][b], a, iou_threshold=cfg.nms_iou_threshold
                    )
                else:
                    k = keep[b, a]
                    d_boxes, d_scores = boxes[b, a][k], scores[b, a][k]
                if multiclass:
                    dets[a].append((d_boxes, d_scores, labels[b, a][keep[b, a]]))
                    gts[a].append(
                        (batch["gt_boxes"][b][a], batch["gt_classes"][b][a])
                    )
                else:
                    dets[a].append((d_boxes, d_scores))
                    gts[a].append(batch["gt_boxes"][b][a])
                if args.tracking:
                    for bb, sc in zip(d_boxes, d_scores):
                        track_rows[(a, scene)].append(
                            f"{frame},{bb[0]:.3f},{bb[1]:.3f},{bb[2]:.3f},{bb[3]:.3f},{bb[4]:.4f},{sc:.4f}"
                        )
                if args.visualization:
                    _render(args, cfg, batch, b, a, scene, frame, d_boxes, d_scores)
            n_frames += 1

    # mAP table: per agent + overall (reference output format, SURVEY.md C23);
    # multi-class configs score per class (reference predict_all semantics)
    # and add a per-class AP table below the per-agent one
    if multiclass:
        from disconet_tpu.evaluation import eval_map_multiclass

        def _eval(d, g, thr):
            return eval_map_multiclass(d, g, iou_thr=thr, num_classes=cfg.num_classes)
    else:
        def _eval(d, g, thr):
            return eval_map(d, g, iou_thr=thr)

    print(f"\nEvaluated {n_frames} scene-frames, mode '{args.com or args.bound or 'lowerbound'}', rsu={args.rsu}")
    overall = {}
    header = f"{'agent':>8} | {'mAP@0.5':>8} | {'mAP@0.7':>8} | {'#gt':>6} | {'#det':>6}"
    print(header)
    print("-" * len(header))
    all_dets, all_gts = [], []
    for a in sorted(dets):
        all_dets += dets[a]
        all_gts += gts[a]
        ap50, d50 = _eval(dets[a], gts[a], 0.5)
        ap70, _ = _eval(dets[a], gts[a], 0.7)
        print(f"{a:>8} | {ap50:8.4f} | {ap70:8.4f} | {d50['num_gts']:>6} | {d50['num_dets']:>6}")
    ap50, d50 = _eval(all_dets, all_gts, 0.5)
    ap70, d70 = _eval(all_dets, all_gts, 0.7)
    print("-" * len(header))
    print(f"{'average':>8} | {ap50:8.4f} | {ap70:8.4f} | {d50['num_gts']:>6} | {d50['num_dets']:>6}")
    overall["mAP@0.5"], overall["mAP@0.7"] = ap50, ap70

    if multiclass:
        header = f"{'class':>8} | {'AP@0.5':>8} | {'AP@0.7':>8} | {'#gt':>6} | {'#det':>6}"
        print("\n" + header)
        print("-" * len(header))
        for c in range(1, cfg.num_classes):
            p5, p7 = d50["per_class"][c], d70["per_class"][c]
            print(f"{c:>8} | {p5['ap']:8.4f} | {p7['ap']:8.4f} | "
                  f"{p5['num_gts']:>6} | {p5['num_dets']:>6}")

    if args.tracking:
        # README.md:86-91 layout: {logpath}/{mode}/{no_rsu|with_rsu}/{split}/
        # det_dumps — `make sort mode=disco/no_rsu split=test` composes the
        # same default path (tools/track/Makefile)
        mode = args.com or args.bound or "lowerbound"
        rsu_dir = "with_rsu" if args.rsu else "no_rsu"
        det_dir = os.path.join(args.logpath, mode, rsu_dir, args.split, "det_dumps")
        os.makedirs(det_dir, exist_ok=True)
        # purge stale dumps: files are only written for (agent, scene) pairs
        # with >=1 detection, so leftovers from a previous run with the same
        # logpath would leak into SORT/CLEAR-MOT scores (ADVICE r2 medium)
        import glob

        for stale in glob.glob(os.path.join(det_dir, "det_agent*_scene*.txt")):
            os.remove(stale)
        for (a, scene), rows in track_rows.items():
            path = os.path.join(det_dir, f"det_agent{a}_scene{scene}.txt")
            with open(path, "w") as f:
                f.write("\n".join(rows) + "\n")
        print(f"tracking dumps: {len(track_rows)} files under {det_dir}")
    return overall


def _render(args, cfg, batch, b, a, scene, frame, d_boxes, d_scores):
    """BEV png: occupancy + gt (green) + detections (red) — SURVEY.md C28."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from disconet_tpu.utils.visualization import render_bev

    out_dir = os.path.join(args.logpath, "vis")
    os.makedirs(out_dir, exist_ok=True)
    from disconet_tpu.training.det_module import get_bev_np

    fig = render_bev(cfg, get_bev_np(batch, "bev", cfg)[b, a], batch["gt_boxes"][b][a], d_boxes, d_scores)
    fig.savefig(os.path.join(out_dir, f"s{scene}_f{frame}_a{a}.png"), dpi=100)
    plt.close(fig)


def _render_edge_weights(args, cfg, model, state, batch, dev_batch):
    """DiscoGraph W_j->i heat-maps for the first batch's first scene-frame —
    the reference qualitative figure's panels d-e (img.png). One png per
    present receiver, one subplot per present sender."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from disconet_tpu.training.det_module import get_bev
    from disconet_tpu.utils.visualization import render_edge_weights

    @jax.jit
    def edge_weights(state, batch):
        _, inter = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            get_bev(batch, "bev", cfg),
            batch["trans"],
            batch["agent_mask"],
            train=False,
            mutable=["intermediates"],
        )
        return inter["intermediates"]["edge_weights"][0]

    w = np.asarray(edge_weights(state, dev_batch))  # (B, Ar, As, h, w)
    out_dir = os.path.join(args.logpath, "vis")
    os.makedirs(out_dir, exist_ok=True)
    b = 0
    scene, frame = (int(x) for x in batch["scene_frame"][b])
    mask = np.asarray(batch["agent_mask"][b]).astype(bool)
    for recv in np.flatnonzero(mask):
        fig = render_edge_weights(w[b, recv], mask, int(recv))
        fig.savefig(os.path.join(out_dir, f"edge_w_s{scene}_f{frame}_a{recv}.png"), dpi=100)
        plt.close(fig)


if __name__ == "__main__":
    main()
