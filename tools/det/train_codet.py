#!/usr/bin/env python
"""Train collaborative detection (SURVEY.md C22, reference tools/det/train_codet.py).

Flag surface preserved from the reference (README.md:54-63):

    python train_codet.py --data <root> --com disco --kd_flag 1 \
        --resume_teacher <teacher ckpt> --rsu 1 --batch 4 --nepoch 100 \
        --logpath logs --auto_resume_path logs

Rebuild extras (documented, additive): ``--grid`` for small synthetic configs,
``--seed``, ``--save_pth`` to control the torch-compat per-epoch export.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from disconet_tpu.utils.env import setup as _env_setup

_env_setup()  # compile cache + honor JAX_PLATFORMS over sitecustomize override
import time

import jax
import numpy as np

from disconet_tpu.config import Config, default_fusion_layer, tiny_config
from disconet_tpu.data import BatchIterator, V2XSimDet
from disconet_tpu.models import TeacherNet, build_model
from disconet_tpu.parallel import make_mesh, replicate_tree, shard_batch
from disconet_tpu.training import (
    CheckpointIO,
    MetricLogger,
    batch_to_device,
    create_train_state,
    make_train_step,
    make_train_step_multi,
    prefetch_to_device,
    stack_host_batches,
)
from disconet_tpu.training.checkpoint import load_pth, save_pth


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train TPU-native collaborative detection")
    # --- reference flags (SURVEY.md C22) ---
    p.add_argument("--data", type=str, required=True, help="dataset root (agent{i}/ dirs)")
    p.add_argument("--com", type=str, default="", help="''|when2com|who2com|v2v|disco|sum|mean|max|cat|agent")
    p.add_argument("--bound", type=str, default="", help="lowerbound|upperbound (with --com '')")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--nepoch", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--kd_flag", type=int, default=0)
    p.add_argument("--kd_weight", type=float, default=100000.0)
    p.add_argument("--layer", type=int, default=None,
                   help="fusion layer index (default: reference's 3 at "
                        "--grid >=128; smaller grids auto-drop to keep the "
                        "fusion map >=16x16 — config.default_fusion_layer)")
    p.add_argument("--rsu", type=int, default=1)
    p.add_argument("--resume", type=str, default="", help=".pth or orbax dir to resume student")
    p.add_argument("--resume_teacher", type=str, default="", help="teacher checkpoint (--kd_flag 1)")
    p.add_argument("--auto_resume_path", type=str, default="", help="scan for latest epoch checkpoint")
    p.add_argument("--logpath", type=str, default="logs")
    p.add_argument("--log", action="store_true", help="enable file/TensorBoard logging")
    p.add_argument("--nworker", type=int, default=2, help="(prefetch depth; kept for CLI compat)")
    p.add_argument("--visualization", type=int, default=0)
    p.add_argument("--warp_flag", type=int, default=1, help="when2com: warp values")
    p.add_argument("--warp_dtype", type=str, default=None, choices=["bfloat16", "float32"],
                   help="inference warp dtype override (config.warp_dtype; training warps are always f32)")
    p.add_argument("--gru_rounds", type=int, default=0,
                   help="--com v2v only: ConvGRU message-passing rounds "
                        "(0 = model default 3). Ablation knob for the v2v "
                        "stability study (BASELINE.md); evaluate checkpoints "
                        "with the same value they trained with")
    # --- rebuild extras ---
    p.add_argument("--grid", type=int, default=256, help="BEV grid cells (256 = reference)")
    p.add_argument("--num_classes", type=int, default=2,
                   help="detection classes incl. background (2 = reference's "
                        "binary vehicle task; >2 trains per-class heads and "
                        "runs per-class NMS at eval)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_pth", type=int, default=1, help="also export epoch_N.pth (compat)")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--remat", type=int, default=0,
                   help="rematerialize intra-stage activations in the backward "
                        "(config.train_remat): saves HBM residual traffic for "
                        "~1x extra forward FLOPs — measure per geometry with "
                        "tools/bench_train_stages.py")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="optimizer steps per device call (lax.scan over K "
                        "stacked batches) — hides the tunnel round trip when "
                        "the per-step compute is small (e.g. 64-grid cells); "
                        "semantics identical to K sequential steps")
    p.add_argument("--profile", type=int, default=0,
                   help="trace N steady-state steps to {logpath}/profile (SURVEY.md 5.2)")
    p.add_argument("--debug_nans", type=int, default=0, help="jax_debug_nans CI smoke mode")
    p.add_argument("--save_best", type=int, default=0,
                   help="track the min end-of-epoch train loss and export "
                        "{logdir}/best.pth with that epoch's weights (written "
                        "at --ckpt_every boundaries; the snapshot lives in "
                        "host RAM between writes). Fixes the off-trajectory "
                        "final-epoch save class (a last-dispatch loss spike "
                        "freezing into the only checkpoint — observed once at "
                        "256-grid, mAP 0.20 vs 0.51 siblings); the reference "
                        "itself keeps every epoch (SURVEY.md C22/5.5)")
    p.add_argument("--ckpt_every", type=int, default=1, help="save checkpoints every N epochs")
    p.add_argument("--ckpt_keep", type=int, default=5,
                   help="orbax checkpoints retained (0 = keep all; epoch_N.pth exports are never pruned)")
    p.add_argument("--cache_items", type=int, default=256, help="in-memory dataset item cache")
    p.add_argument("--max_pos", type=int, default=0,
                   help="override config.max_pos_anchors (P, the padded "
                        "positive-site capacity per agent-frame; 0 = config "
                        "default 2048). The packed loss gathers/scatters P "
                        "rows per agent-frame, so a P sized to the data's "
                        "true positive max trims dead loss traffic "
                        "(tools/bench_train.py sweep, docs/performance.md); "
                        "the dataset warns if any frame overflows and drops "
                        "the excess positives")
    p.add_argument("--kd_cache", type=int, default=1,
                   help="precompute frozen-teacher KD features once into HBM and gather "
                        "per step (1) vs re-forward the teacher every step (0); "
                        "auto-disables if the table exceeds --kd_cache_gb")
    p.add_argument("--kd_cache_gb", type=float, default=4.0,
                   help="HBM budget for the KD feature cache (bf16 tables)")
    p.add_argument("--mesh_agent", type=int, default=1,
                   help="mesh axis size sharding the agent dim (fusion gather -> ICI all_gather)")
    p.add_argument("--mesh_spatial", type=int, default=1,
                   help="mesh axis size sharding the BEV H dim (GSPMD conv halo exchange)")
    args = p.parse_args(argv)
    if args.layer is None:
        args.layer = default_fusion_layer(args.grid)
        if args.layer != 3:
            print(f"--layer auto: {args.layer} (fusion map >=16x16 at "
                  f"--grid {args.grid}; pass --layer 3 for the reference index)")
    return args


def make_config(args) -> Config:
    over = dict(kd_weight=args.kd_weight, fusion_layer=args.layer)
    if getattr(args, "warp_dtype", None):
        over["warp_dtype"] = args.warp_dtype
    if getattr(args, "remat", 0):
        over["train_remat"] = True
    if getattr(args, "num_classes", 2) != 2:
        over["num_classes"] = args.num_classes
    if getattr(args, "max_pos", 0):
        over["max_pos_anchors"] = args.max_pos
    return Config(**over) if args.grid == 256 else tiny_config(args.grid, **over)


def mode_name(args) -> str:
    return (args.com or args.bound or "lowerbound") + ("_kd" if args.kd_flag else "")


def load_student_ckpt(args, state):
    """Resume priority: --resume (.pth/orbax) > --auto_resume_path > fresh."""
    start_epoch = 0
    if args.resume:
        if args.resume.endswith(".pth"):
            params, stats, epoch, _ = load_pth(args.resume, state.params, state.batch_stats)
            state = state.replace(params=params, batch_stats=stats)
            start_epoch = epoch
            print("NOTE: .pth resume restores params/batch_stats only — Adam "
                  "moments restart from zero (use the orbax dir to resume them)")
        else:
            from disconet_tpu.training.checkpoint import restore_or_die

            state, start_epoch, _ = restore_or_die(args.resume, state)
    elif args.auto_resume_path:
        auto_dir = os.path.join(args.auto_resume_path, mode_name(args), "ckpt")
        if os.path.isdir(auto_dir):
            state, epoch = CheckpointIO(auto_dir).restore(state)
            if epoch is not None:
                start_epoch = epoch
                print(f"auto-resumed from epoch {epoch} at {auto_dir}")
    return state, start_epoch


def _metrics_floats(metrics):
    """Step metrics -> python floats; multi-step dispatch stacks per-step
    values (K,) per key, in which case log the last step's."""
    return {k: float(np.asarray(v).reshape(-1)[-1]) for k, v in metrics.items()}


def main(argv=None):
    args = parse_args(argv)
    if args.debug_nans:
        from disconet_tpu.utils.profiling import enable_nan_checks

        enable_nan_checks()
    cfg = make_config(args)
    rng = jax.random.PRNGKey(args.seed)

    dataset = V2XSimDet(args.data, cfg, rsu=bool(args.rsu), bound=args.bound,
                        dense_targets=False, cache_items=args.cache_items)
    if len(dataset) == 0:
        raise SystemExit(f"no frames found under {args.data}")
    loader = BatchIterator(dataset, args.batch, shuffle=True, seed=args.seed, num_workers=args.nworker)
    if len(loader) == 0:  # drop_last: fewer frames than --batch -> no batches
        raise SystemExit(
            f"dataset has {len(dataset)} scene-frames, fewer than --batch {args.batch}"
        )
    print(f"dataset: {len(dataset)} scene-frames, {len(loader)} batches/epoch")

    model = build_model(args.com or args.bound, cfg, kd_flag=bool(args.kd_flag),
                        layer=args.layer, warp_flag=bool(args.warp_flag),
                        gru_rounds=args.gru_rounds)
    sample = next(iter(BatchIterator(dataset, args.batch, shuffle=False)))
    state = create_train_state(model, cfg, rng, sample, lr=args.lr)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"model '{mode_name(args)}': {n_params/1e6:.2f}M params")

    teacher = teacher_vars = None
    if args.kd_flag:
        from disconet_tpu.training.det_module import get_bev_np

        teacher = TeacherNet(config=cfg)
        t_rng = jax.random.PRNGKey(args.seed + 1)
        teacher_bev = get_bev_np(sample, "bev_teacher", cfg)
        tv = teacher.init(t_rng, teacher_bev, None, sample["agent_mask"], train=False)
        if args.resume_teacher:
            if args.resume_teacher.endswith(".pth"):
                tp, ts, _, _ = load_pth(args.resume_teacher, tv["params"], tv.get("batch_stats", {}))
            else:
                from disconet_tpu.training.checkpoint import restore_or_die

                tmp_state = create_train_state(teacher, cfg, t_rng,
                    {**sample, "bev": teacher_bev}, lr=args.lr)
                # restore_or_die: a typo'd path must fail loudly, not train
                # KD against a random teacher at kd_weight=1e5
                tmp_state, _, _ = restore_or_die(args.resume_teacher, tmp_state)
                tp, ts = tmp_state.params, tmp_state.batch_stats
            teacher_vars = {"params": tp, "batch_stats": ts}
            print(f"loaded frozen teacher from {args.resume_teacher}")
        else:
            print("WARNING: --kd_flag 1 without --resume_teacher: distilling against a random teacher")
            teacher_vars = tv

    logdir = os.path.join(args.logpath, mode_name(args))
    os.makedirs(logdir, exist_ok=True)
    ckpt_io = CheckpointIO(os.path.join(logdir, "ckpt"), max_to_keep=args.ckpt_keep or None)
    state, start_epoch = load_student_ckpt(args, state)
    logger = MetricLogger(logdir, log=args.log)

    mesh = make_mesh(n_agent=args.mesh_agent, n_spatial=args.mesh_spatial)
    multi = mesh.devices.size > 1
    if multi:
        state = state.replace(
            params=replicate_tree(state.params, mesh),
            batch_stats=replicate_tree(state.batch_stats, mesh),
            opt_state=replicate_tree(state.opt_state, mesh),
        )
        if teacher_vars is not None:
            teacher_vars = replicate_tree(teacher_vars, mesh)
        print(f"mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")

    kd_from_cache = False
    if args.kd_flag and args.kd_cache:
        from disconet_tpu.training.det_module import (
            precompute_teacher_feats,
            teacher_feat_bytes,
        )

        nbytes = teacher_feat_bytes(teacher, teacher_vars, cfg, len(dataset),
                                    batch_size=args.batch)
        if nbytes <= args.kd_cache_gb * 2**30:
            t0 = time.time()
            teacher_vars = precompute_teacher_feats(
                teacher, teacher_vars, dataset, cfg, batch_size=args.batch,
                num_workers=args.nworker, mesh=mesh if multi else None,
            )
            kd_from_cache = True
            print(f"KD cache: {nbytes / 2**20:.0f} MiB of teacher features "
                  f"precomputed in {time.time() - t0:.1f}s — the per-step "
                  f"teacher forward and bev_teacher transfer are gone")
        else:
            print(f"KD cache disabled: table would be {nbytes / 2**30:.2f} GiB "
                  f"> --kd_cache_gb {args.kd_cache_gb}; re-forwarding per step")

    K = max(1, args.steps_per_dispatch)
    if K > 1 and multi:
        raise SystemExit("--steps_per_dispatch > 1 is single-device only "
                         "(the mesh path shards per-batch)")
    step_kwargs = dict(teacher=teacher, kd_flag=bool(args.kd_flag),
                       kd_from_cache=kd_from_cache)
    train_step = (make_train_step_multi(model, cfg, **step_kwargs) if K > 1
                  else make_train_step(model, cfg, **step_kwargs))

    import functools

    to_device = functools.partial(shard_batch, mesh=mesh) if multi else batch_to_device

    def host_batches():
        def plain():
            for batch in loader:
                if not args.kd_flag or kd_from_cache:  # skip the dead copy
                    batch.pop("bev_teacher", None)
                    batch.pop("bev_teacher_packed", None)
                yield batch

        if K == 1:
            yield from plain()
            return
        group = []  # group K host batches into one stacked dispatch
        for b in plain():
            group.append(b)
            if len(group) == K:
                yield stack_host_batches(group)
                group = []
        if group:  # epoch tail: a shorter scan (one extra compile)
            yield stack_host_batches(group)

    step = 0
    profiler_span = None
    profile_done = False
    predict_vis = None  # built lazily on first --visualization render
    # --save_best: min end-of-epoch loss -> host-RAM weight snapshot; disk
    # writes only at checkpoint boundaries (device_get per improving epoch is
    # ~31 MB over the tunnel; per-epoch .pth I/O measured ~8 s/epoch)
    best = {"loss": float("inf"), "epoch": None, "snap": None,
            "written": None} if args.save_best else None
    for epoch in range(start_epoch + 1, args.nepoch + 1):
        t_ep = time.time()
        last = {}
        # transfers for batch n+1 are issued while step n executes
        for dev_batch in prefetch_to_device(host_batches(), to_device):
            # >= not ==: with --steps_per_dispatch K>1 `step` advances by K
            # and would jump straight past 2, never opening the span
            if args.profile and not profile_done and profiler_span is None and step >= 2:
                from disconet_tpu.utils.profiling import trace

                profiler_span = trace(os.path.join(logdir, "profile"))
                profiler_span.__enter__()
            state, metrics = train_step(state, dev_batch, teacher_vars)
            # with K > 1 a dispatch advances by its scan length (tail may be short)
            step += (next(iter(dev_batch.values())).shape[0] if K > 1 else 1)
            # >= not ==: with --steps_per_dispatch K>1 `step` advances by K,
            # so equality can jump past the threshold and the trace would
            # silently span the whole run (ADVICE r2)
            if profiler_span is not None and step >= 2 + args.profile:
                jax.tree_util.tree_map(lambda x: x.block_until_ready(), metrics)
                profiler_span.__exit__(None, None, None)
                profiler_span = None
                profile_done = True
                print(f"profiler trace written to {os.path.join(logdir, 'profile')}")
            if step % args.log_every == 0:
                last = _metrics_floats(metrics)
                logger.write(step, last, prefix=f"epoch {epoch}")
        if not last:
            last = _metrics_floats(metrics)
        dt = time.time() - t_ep
        sps = len(loader) * args.batch / dt
        logger.write(step, {**last, "scenes_per_sec": sps}, prefix=f"epoch {epoch} done")
        if best is not None:
            ep_loss = last.get("loss")
            # a nan/inf epoch must never become "best"
            if ep_loss is not None and np.isfinite(ep_loss) and ep_loss < best["loss"]:
                best.update(loss=float(ep_loss), epoch=epoch,
                            snap=jax.device_get((state.params, state.batch_stats)))
        if epoch % args.ckpt_every == 0 or epoch == args.nepoch:
            if best is not None and best["snap"] is not None and best["epoch"] != best["written"]:
                _write_best(logdir, best)
            host_state = jax.device_get(state)
            ckpt_io.save(epoch, host_state)
            if args.save_pth:
                save_pth(os.path.join(logdir, f"epoch_{epoch}.pth"), host_state,
                         epoch, loss=last.get("loss", 0.0))
            if args.visualization:
                if predict_vis is None:
                    from disconet_tpu.training import make_predict_step

                    predict_vis = make_predict_step(model, cfg)
                _render_train_panel(cfg, predict_vis, state, sample, to_device,
                                    logdir, epoch)
    if profiler_span is not None:  # run ended before 2 + --profile steps
        profiler_span.__exit__(None, None, None)
        print(f"profiler trace written to {os.path.join(logdir, 'profile')} "
              f"(run ended before --profile {args.profile} steps completed)")
    logger.close()
    print(f"training complete: {args.nepoch} epochs, checkpoints in {logdir}")


def _write_best(logdir: str, best: dict) -> None:
    """Atomically (re)write {logdir}/best.pth from the tracked best-of-epoch
    snapshot. The printed line is the machine-readable record the quality
    harness parses for its per-cell checkpoint stamp."""
    import types

    path = os.path.join(logdir, "best.pth")
    save_pth(path + ".tmp",
             types.SimpleNamespace(params=best["snap"][0], batch_stats=best["snap"][1]),
             best["epoch"], loss=best["loss"])
    os.replace(path + ".tmp", path)
    best["written"] = best["epoch"]
    print(f"best checkpoint: epoch {best['epoch']} loss={best['loss']:.5f} -> {path}",
          flush=True)


def _render_train_panel(cfg, predict, state, batch, to_device, logdir, epoch):
    """``--visualization`` (SURVEY.md C22): per checkpointed epoch, render one
    BEV panel of the current model's detections vs gt on the fixed sample
    batch under ``{logdir}/vis`` — training-progress eyeballing, the
    reference's train-CLI visualization role."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from disconet_tpu.training.det_module import get_bev_np
    from disconet_tpu.utils.visualization import render_bev

    preds = predict(state, to_device(dict(batch)))
    boxes, scores, keep = (np.asarray(x) for x in preds[:3])
    b = 0
    mask = np.asarray(batch["agent_mask"][b]).astype(bool)
    if not mask.any():
        return
    a = int(np.flatnonzero(mask)[0])
    k = keep[b, a]
    fig = render_bev(
        cfg,
        get_bev_np(batch, "bev", cfg)[b, a],
        batch["gt_boxes"][b][a],
        boxes[b, a][k],
        scores[b, a][k],
    )
    out_dir = os.path.join(logdir, "vis")
    os.makedirs(out_dir, exist_ok=True)
    fig.savefig(os.path.join(out_dir, f"epoch_{epoch}_a{a}.png"), dpi=100)
    plt.close(fig)
    print(f"visualization: {os.path.join(out_dir, f'epoch_{epoch}_a{a}.png')}")


if __name__ == "__main__":
    main()
