#!/usr/bin/env python
"""Statistically meaningful quality benchmark (SURVEY.md §6 / BASELINE.md).

Round-1's quality table rested on 18 val scene-frames and one seed — the
inter-model gaps were within run-to-run noise (VERDICT r1 weak #1). This
harness runs the full operating-point matrix (the five named points of
arXiv:2111.00643 Table 1 + extras) x N seeds on a larger synthetic dataset,
evaluating each trained model through the real CLIs (tools/det/train_codet.py
-> tools/det/test_codet.py), and reports mean +/- std per point so every
claimed ordering gap can be checked against its own noise floor.

Results accumulate incrementally in --out (JSON); finished (config, seed)
cells are skipped on re-run, so the matrix is resumable after interruption.

Usage:
    python tools/bench_quality.py --root /tmp/v2x_bench --seeds 0 1 2 \
        --nepoch 100 --out /tmp/v2x_bench/results.json        # run matrix
    python tools/bench_quality.py --out /tmp/v2x_bench/results.json --summarize
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _bench_harness import (  # noqa: E402
    REPO, gap_vs_noise, gen_synthetic, load_results, provenance, save_results,
    sh, with_retries)

# operating point -> extra train/test CLI flags. disco_kd's teacher is the
# SAME seed's trained upperbound checkpoint (TeacherNet == FaFNet-upperbound
# architecture with KD taps; reference README.md:59 --resume_teacher).
CONFIGS = {
    # NB: intermediate-fusion cells pin --layer explicitly. The CLIs now
    # default to config.default_fusion_layer (resolution-aware: layer 2 at
    # the matrix's 64-grid); the un-suffixed cells below predate that and
    # stay at the reference's layer index 3 so rows remain comparable
    # across rounds — the _l2 cells are the resolution-matched points.
    "lowerbound": ["--bound", "lowerbound"],
    "upperbound": ["--bound", "upperbound"],
    "when2com": ["--com", "when2com", "--layer", "3"],
    "v2v": ["--com", "v2v", "--layer", "3"],
    "disco": ["--com", "disco", "--layer", "3"],
    "disco_kd": ["--com", "disco", "--kd_flag", "1", "--layer", "3"],
    "disco_norsu": ["--com", "disco", "--rsu", "0", "--layer", "3"],
    "mean": ["--com", "mean", "--layer", "3"],
    "max": ["--com", "max", "--layer", "3"],
    # layer-2 fusion diagnostics (VERDICT r2 #1): at 64-grid, layer-3 fusion
    # operates on 8x8 maps (2 m/cell) — likely too coarse to transport
    # neighbor-only boxes; layer 2 fuses at 16x16, the same relative
    # resolution as the reference's 32x32-at-256-grid default (SURVEY §4.1)
    "disco_l2": ["--com", "disco", "--layer", "2"],
    "disco_kd_l2": ["--com", "disco", "--kd_flag", "1", "--layer", "2"],
    "v2v_l2": ["--com", "v2v", "--layer", "2"],
    "when2com_l2": ["--com", "when2com", "--layer", "2"],
    # rsu ablation at the resolution-matched point: at layer 3 (8x8) disco
    # itself sits within noise of lowerbound in the occluded regime, so only
    # the _l2 ablation can resolve the rsu contribution
    "disco_l2_norsu": ["--com", "disco", "--rsu", "0", "--layer", "2"],
    # trajectory validation (VERDICT r3 #8): same operating point as disco_l2
    # but trained at HEAD (packed loss) in its own checkpoint dir — anchors
    # the packed-loss rows to the round-3 view-loss rows by measurement, on
    # top of the unit-level value+grad equality (tests/test_packed_loss.py)
    "disco_l2_hv": ["--com", "disco", "--layer", "2"],
    # who2com (paper Table 1's handshake hard-select variant, VERDICT r4 #5)
    # at the resolution-matched point
    "who2com_l2": ["--com", "who2com", "--layer", "2"],
    # v2v optimization-hygiene ablation (VERDICT r4 weak #3): 1 ConvGRU round
    # vs the default 3 — distinguishes "ConvGRU mechanism loses here" from
    # "3-round recurrence trains badly on this benchmark"
    "v2v_l2_r1": ["--com", "v2v", "--layer", "2", "--gru_rounds", "1"],
}
# configs whose train-CLI mode dir differs from the matrix cell name (the CLI
# writes under {com}{_kd}; same-mode cells with different flags need their own
# logpath subdir so checkpoints don't collide)
MODE_DIR = {
    "disco_norsu": "disco",
    "disco_l2": "disco",
    "disco_kd_l2": "disco_kd",
    "v2v_l2": "v2v",
    "when2com_l2": "when2com",
    "disco_l2_norsu": "disco",
    "disco_l2_hv": "disco",
    "who2com_l2": "who2com",
    "v2v_l2_r1": "v2v",
}
# eval-only robustness rows (--extra_evals): reuse a trained base
# checkpoint, re-evaluate with extra test flags — the paper's pose-noise
# robustness study (and late fusion) with the same seeds/error bars.
# --pose_noise_rot_std is in RADIANS (utils/pose_noise.py); the paper's
# operating point is 0.4 m / 4 degrees = 4*pi/180 rad.
_ROT_4DEG = f"{4 * 3.141592653589793 / 180:.6f}"
EXTRA_EVALS = {
    "disco_kd+noise": ("disco_kd", ["--pose_noise_std", "0.4",
                                    "--pose_noise_rot_std", _ROT_4DEG]),
    "disco+noise": ("disco", ["--pose_noise_std", "0.4",
                              "--pose_noise_rot_std", _ROT_4DEG]),
    "disco_kd+latefuse": ("disco_kd", ["--apply_late_fusion", "1"]),
}

# (hi, lo) ordering claims checked by --summarize and rendered to markdown by
# tools/results_to_md.py --orderings (one source so BASELINE.md cannot drift
# from the artifact — the r2/r3 doc-drift failure class)
ORDERINGS = [
    ("upperbound", "lowerbound"), ("disco_kd", "disco"),
    ("disco", "lowerbound"), ("disco_kd", "lowerbound"),
    ("v2v", "when2com"), ("when2com", "lowerbound"),
    ("disco", "disco_norsu"),
    ("disco_l2", "disco"), ("disco_l2", "lowerbound"),
    ("disco_kd_l2", "disco_kd"), ("disco_kd_l2", "disco_l2"),
    ("disco_kd_l2", "lowerbound"), ("v2v_l2", "v2v"),
    # cross-model claims at the resolution-matched point
    # (paper Table 1: when2com < lowerbound < v2v ~ disco)
    ("v2v_l2", "lowerbound"), ("disco_l2", "v2v_l2"),
    ("v2v_l2", "when2com_l2"), ("when2com_l2", "lowerbound"),
    ("disco_l2", "when2com_l2"),
    # rsu ablation + HEAD trajectory validation
    ("disco_norsu", "lowerbound"),
    ("disco_l2", "disco_l2_norsu"), ("disco_l2_norsu", "lowerbound"),
    ("disco_l2_hv", "lowerbound"), ("disco_l2_hv", "disco_l2"),
    # who2com rows (paper Table 1 lists who2com alongside when2com)
    ("who2com_l2", "lowerbound"), ("when2com_l2", "who2com_l2"),
    ("disco_l2", "who2com_l2"),
    # v2v GRU-rounds ablation: does cutting recurrence stabilize training?
    ("v2v_l2_r1", "lowerbound"), ("v2v_l2", "v2v_l2_r1"),
    ("disco_l2", "v2v_l2_r1"),
    # robustness (--extra_evals): collaboration under the paper's pose noise
    # (0.4 m / 4 deg) must still beat no-collaboration, and the cost of the
    # noise itself is the gap to the clean row
    ("disco_kd+noise", "lowerbound"), ("disco_kd", "disco_kd+noise"),
    ("disco+noise", "lowerbound"), ("disco_kd+latefuse", "disco_kd"),
]

# MOTA ordering claims over the --track_evals rows (same machinery)
TRACK_ORDERINGS = [
    ("disco_kd+track", "lowerbound+track"),
    ("disco_kd+track", "disco+track"),
    ("disco+track", "lowerbound+track"),
]

AVG_RE = re.compile(r"average \|\s+([\d.]+) \|\s+([\d.]+) \|\s+(\d+) \|\s+(\d+)")
# nan/inf alternatives FIRST: with the numeric class first, 'loss=-inf'
# matches the bare '-' and float() raises (ADVICE r4)
EPOCH_LOSS_RE = re.compile(
    r"epoch \d+ done .*?(?<![\w])loss=(-?nan|-?inf|[\d.eE+-]+)")
# train CLI --save_best record line (parsed for the per-cell ckpt stamp)
BEST_CKPT_RE = re.compile(r"best checkpoint: epoch (\d+) loss=(-?nan|-?inf|[\d.eE+-]+)")
# JSON-safe stand-in for a nan/inf epoch loss: large enough that any
# --max_loss_ratio filter flags the cell (a diverged save is the most
# off-trajectory save there is), and representable in strict JSON
NONFINITE_LOSS = 1e30


def epoch_loss_stats(log_file: str) -> dict:
    """{final, min} end-of-epoch train loss parsed from the cell's train log.

    Observational save-point-quality stamp: the matrix trains with
    final-epoch-only checkpoints (cost, docs/benchmarking.md), which couples
    each cell to the state after its very last optimizer dispatch. Observed
    once at 256-grid (disco/seed1): epochs converged to loss 0.006, the last
    dispatch spiked to 0.255 (grad_norm 1.7), and the checkpoint saved
    mid-spike scored 0.197 mAP@0.7 vs the clean seed's 0.537. A cell whose
    ``final_epoch_loss`` is ≫ its ``min_epoch_loss`` documents that the
    saved weights are off-trajectory — the row stays in the artifact, the
    stamp explains it."""
    import math

    try:
        with open(log_file) as f:
            text = f.read()
    except OSError:
        return {}
    text = _last_train_attempt(text)
    losses = []
    for m in EPOCH_LOSS_RE.finditer(text):
        try:
            losses.append(float(m.group(1)))
        except ValueError:  # defense-in-depth if the regex ever re-breaks
            losses.append(NONFINITE_LOSS)
    if not losses:
        return {}
    # a nan/inf epoch (MetricLogger prints '%.5f' -> 'nan') must flag the
    # cell, not silently fall back to the last finite epoch's healthy value
    losses = [x if math.isfinite(x) else NONFINITE_LOSS for x in losses]
    return {"final_epoch_loss": losses[-1], "min_epoch_loss": min(losses)}


def _last_train_attempt(text: str) -> str:
    """Drop everything before the last logged train-CLI invocation.

    with_retries re-runs a crashed training command appending to the same
    cell log, so a min over ALL 'epoch N done' lines could come from a
    discarded earlier trajectory (ADVICE r4). sh() writes each command as a
    '$ ...' header line; the segment after the last train header is the only
    trajectory whose checkpoint survived."""
    starts = [m.end() for m in re.finditer(r"^\$ .*train_codet\.py.*$", text, re.M)]
    return text[starts[-1]:] if starts else text


def best_ckpt_stats(log_file: str) -> dict:
    """{best_epoch, best_epoch_loss} from the train CLI's --save_best record
    line (last write wins — the CLI re-prints whenever best.pth is rewritten)."""
    try:
        with open(log_file) as f:
            text = _last_train_attempt(f.read())
    except OSError:
        return {}
    hits = BEST_CKPT_RE.findall(text)
    if not hits:
        return {}
    epoch, loss = hits[-1]
    try:
        loss_f = float(loss)
    except ValueError:
        loss_f = NONFINITE_LOSS
    return {"best_epoch": int(epoch), "best_epoch_loss": loss_f}
# eval_mot.py's "avg" row: MOTA (can be negative) then MOTP
MOT_AVG_RE = re.compile(r"avg \|\s+(-?[\d.]+) \|\s+([\d.]+)")
# configs whose checkpoints get the tracking pipeline (--track_evals)
TRACK_EVALS = ("disco_kd", "disco", "lowerbound")


def cell_ckpt(logpath: str, name: str, nepoch: int, save_best: bool) -> str:
    """The checkpoint a cell is measured on. With the best-of-epoch policy
    that is {mode_dir}/best.pth; legacy cells (and --save_best 0) use the
    final-epoch export. Eval-only passes (extra/track evals) call this with
    save_best=None: prefer best.pth when the training cell saved one, so the
    derived rows score the SAME weights the cell's mAP row did."""
    mode_dir = os.path.join(logpath, MODE_DIR.get(name, name))
    best = os.path.join(mode_dir, "best.pth")
    final = os.path.join(mode_dir, f"epoch_{nepoch}.pth")
    if save_best is None:
        return best if os.path.exists(best) else final
    return best if save_best else final


def run_cell(name, seed, args, results, out_path):
    key = f"{name}/seed{seed}"
    if key in results:
        print(f"[skip] {key}: {results[key]}")
        return
    base_logpath = os.path.join(args.root, "logs", f"seed{seed}")
    logpath = base_logpath
    if name in MODE_DIR:  # own subdir: the CLI's mode dir would collide
        logpath = os.path.join(logpath, name)
    os.makedirs(logpath, exist_ok=True)
    log_file = os.path.join(logpath, f"{name}.log")
    extra = list(CONFIGS[name])
    if "--kd_flag" in extra:  # any KD cell: same seed's trained upperbound
        tdir = os.path.join(base_logpath, "upperbound")
        # prefer the best-of-epoch teacher when its cell saved one
        teacher = os.path.join(tdir, "best.pth")
        if not os.path.exists(teacher):
            teacher = os.path.join(tdir, f"epoch_{args.nepoch}.pth")
        if not os.path.exists(teacher):
            raise RuntimeError(f"{key}: teacher checkpoint missing ({teacher}); "
                               "upperbound must run first for this seed")
        extra += ["--resume_teacher", teacher]

    t0 = time.time()
    save_best = bool(getattr(args, "save_best", 0))
    # train CLI writes under (com or bound) + optional _kd == the config key
    resume = cell_ckpt(logpath, name, args.nepoch, save_best)
    trained = not os.path.exists(resume)
    if trained:  # mid-cell resume: train only if needed
        with_retries(f"{key} train", lambda: sh(
            [sys.executable, "tools/det/train_codet.py",
             "--data", os.path.join(args.root, "train"), *extra,
             "--batch", str(args.batch), "--nepoch", str(args.nepoch),
             "--grid", str(args.grid), "--seed", str(seed),
             "--logpath", logpath,
             # final-epoch checkpoint only: per-epoch orbax+pth export measured
             # ~8 s/epoch of host I/O — 77% of a cell's wall time at 64-grid
             "--ckpt_every", str(args.nepoch), "--ckpt_keep", "1",
             # best-of-epoch save policy (VERDICT r4 weak #2): the evaluated
             # checkpoint is the min end-of-epoch-loss snapshot, so a
             # final-dispatch loss spike can no longer freeze into the cell
             *(["--save_best", "1"] if save_best else []),
             # P trim (exact-semantics, train-only — test CLI has no such knob)
             *(["--max_pos", str(args.max_pos)] if args.max_pos else []),
             # 8 optimizer steps per device dispatch: 64-grid cells are
             # tunnel-RTT-bound (measured 75.9 -> 263.7 scenes/s, 3.5x)
             "--steps_per_dispatch", "8"], log_file))
    cell = with_retries(f"{key} eval", lambda: run_eval(
        name, resume, [], args, logpath, log_file))
    cell["ckpt"] = "best" if save_best else "final"
    if save_best:
        cell.update(best_ckpt_stats(log_file))
    if trained:  # on a resumed cell t0-to-now is eval time, not training
        cell["train_s"] = round(time.time() - t0, 1)
    # loss stats are observational from the persisted log — stamp them even
    # when training happened in an earlier (crashed) session, so a mid-spike
    # save can never evade --max_loss_ratio by interrupting the harness
    cell.update(epoch_loss_stats(log_file))
    # a resumed-checkpoint eval must not claim this checkout trained it
    cell["prov"] = provenance(args, extra,
                              stage="train" if trained else "eval-resume")
    results[key] = cell
    save_results(results, out_path)
    print(f"[done] {key}: {results[key]}", flush=True)


def run_eval(base, resume, test_extra, args, logpath, log_file):
    """test_codet.py on a checkpoint -> parsed average mAP row."""
    # --batch 4: at batch 1 each val frame pays its own tunnel round trips
    # (~7 min for 192 frames vs ~2); mAP accumulation is per-frame so batching
    # only moves f32 LSBs (the batch-shape caveat of test_cli_integration.py)
    # strip --kd_flag positionally (flag + its value); a membership filter
    # on the token "1" would also eat other flags' values (ADVICE r2)
    flags = list(CONFIGS[base])
    if "--kd_flag" in flags:
        i = flags.index("--kd_flag")
        del flags[i:i + 2]
    test_cmd = [sys.executable, "tools/det/test_codet.py",
                "--data", os.path.join(args.root, "val"), *flags,
                "--resume", resume, "--grid", str(args.grid), "--batch", "4",
                "--logpath", logpath, *test_extra]
    stdout = sh(test_cmd, log_file, capture=True)
    m = AVG_RE.search(stdout)
    if not m:
        raise RuntimeError(f"no mAP table in test output (see {log_file})")
    return {
        "mAP@0.5": float(m.group(1)),
        "mAP@0.7": float(m.group(2)),
        "n_gt": int(m.group(3)),
        "n_det": int(m.group(4)),
    }


def run_extra_evals(args, results, out_path):
    """Eval-only cells over the already-trained matrix checkpoints."""
    for name, (base, flags) in EXTRA_EVALS.items():
        for seed in args.seeds:
            key = f"{name}/seed{seed}"
            if key in results:
                print(f"[skip] {key}")
                continue
            logpath = os.path.join(args.root, "logs", f"seed{seed}")
            resume = cell_ckpt(logpath, base, args.nepoch, None)
            if not os.path.exists(resume):
                print(f"[miss] {key}: no {resume}")
                continue
            cell = with_retries(key, lambda: run_eval(
                base, resume, flags, args, logpath,
                os.path.join(logpath, f"{name}.log")))
            cell["prov"] = provenance(args, CONFIGS[base], stage="eval-only")
            results[key] = cell
            save_results(results, out_path)
            print(f"[done] {key}: {results[key]}", flush=True)


def run_track_evals(args, results, out_path):
    """Tracking quality with error bars: for each TRACK_EVALS config x seed,
    dump val detections (test_codet --tracking), associate with SORT, score
    with CLEAR-MOT — the full reference `make sort && make eval` pipeline
    (README.md:85-100), seeded like the det matrix."""
    for base in TRACK_EVALS:
        for seed in args.seeds:
            key = f"{base}+track/seed{seed}"
            if key in results:
                print(f"[skip] {key}")
                continue
            logpath = os.path.join(args.root, "logs", f"seed{seed}")
            resume = cell_ckpt(logpath, base, args.nepoch, None)
            if not os.path.exists(resume):
                print(f"[miss] {key}: no {resume}")
                continue
            log_file = os.path.join(logpath, f"{base}+track.log")
            # test_codet writes {logpath}/{mode}/{with_rsu}/{split}/det_dumps
            # and mode strips the _kd suffix, so disco and disco_kd would
            # share (and cross-contaminate) one dump dir; give every config
            # its own tracking logpath instead (ADVICE r2 medium)
            mode = "disco" if base.startswith("disco") else base
            track_logpath = os.path.join(logpath, "track", base)

            def _pipeline():
                run_eval(base, resume,
                         ["--tracking", "--split", "val",
                          "--logpath", track_logpath],
                         args, logpath, log_file)
                dumps = os.path.join(track_logpath, mode, "with_rsu", "val",
                                     "det_dumps")
                tracks = os.path.join(os.path.dirname(dumps), "tracks")
                sh([sys.executable, "tools/track/sort.py",
                    "--det_logs_path", dumps, "--out", tracks], log_file)
                return sh([sys.executable, "tools/track/eval_mot.py",
                           "--data", os.path.join(args.root, "val"),
                           "--tracks", tracks, "--grid", str(args.grid)],
                          log_file, capture=True)

            stdout = with_retries(key, _pipeline)
            m = MOT_AVG_RE.search(stdout)
            if not m:
                raise RuntimeError(f"no CLEAR-MOT avg row for {key} "
                                   f"(see {log_file})")
            results[key] = {"MOTA": float(m.group(1)), "MOTP": float(m.group(2)),
                            "prov": provenance(args, CONFIGS[base],
                                               stage="eval-only")}
            save_results(results, out_path)
            print(f"[done] {key}: {results[key]}", flush=True)


def summarize(results, configs, seeds):
    import numpy as np

    print(f"\n{'config':<12} {'mAP@0.5':>16} {'mAP@0.7':>16}  n")
    rows = {}
    for name in configs:
        vals = [results[f"{name}/seed{s}"] for s in seeds
                if f"{name}/seed{s}" in results]
        if not vals:
            continue
        m5 = np.array([v["mAP@0.5"] for v in vals])
        m7 = np.array([v["mAP@0.7"] for v in vals])
        rows[name] = (m5, m7)
        print(f"{name:<12} {m5.mean():.4f} +/- {m5.std():.4f} "
              f"{m7.mean():.4f} +/- {m7.std():.4f}  {len(vals)}")
    # the paper's ordering claims (SURVEY.md §6), checked against noise
    print("\nordering checks (gap vs combined std, mAP@0.7):")
    for hi, lo in ORDERINGS:
        if hi in rows and lo in rows:
            gap_vs_noise(f"{hi} - {lo}", rows[hi][1], rows[lo][1])

    # tracking rows (--track_evals), if present
    mot_rows = {}
    for base in TRACK_EVALS:
        vals = [results[f"{base}+track/seed{s}"] for s in seeds
                if f"{base}+track/seed{s}" in results]
        if vals:
            mot_rows[base] = (np.array([v["MOTA"] for v in vals]),
                              np.array([v["MOTP"] for v in vals]))
    if mot_rows:
        print(f"\n{'tracking on':<12} {'MOTA':>16} {'MOTP':>16}  n")
        for base, (mota, motp) in mot_rows.items():
            print(f"{base:<12} {mota.mean():.4f} +/- {mota.std():.4f} "
                  f"{motp.mean():.4f} +/- {motp.std():.4f}  {len(mota)}")
        print("\nordering checks (MOTA):")
        for hi, lo in TRACK_ORDERINGS:
            hi_b, lo_b = hi.split("+")[0], lo.split("+")[0]
            if hi_b in mot_rows and lo_b in mot_rows:
                gap_vs_noise(f"{hi_b} - {lo_b}",
                             mot_rows[hi_b][0], mot_rows[lo_b][0])
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, default="/tmp/v2x_bench")
    p.add_argument("--out", type=str, default=None, help="results JSON "
                   "(default {root}/results.json)")
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--configs", type=str, nargs="+", default=list(CONFIGS))
    p.add_argument("--nepoch", type=int, default=100)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--grid", type=int, default=64)
    p.add_argument("--train_scenes", type=int, default=24)
    p.add_argument("--val_scenes", type=int, default=24)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--max_pos", type=int, default=0,
                   help="train-only --max_pos passthrough (P, the packed-loss "
                        "positive-site budget). P=1024 is exact-semantics on "
                        "the synthetic 256-grid data (max 608 positives/"
                        "agent-frame measured, r4 P sweep) and ~+25%% train "
                        "throughput; 0 = config default (2048)")
    p.add_argument("--save_best", type=int, default=1,
                   help="1 (default) = cells train with --save_best and are "
                        "measured on the min end-of-epoch-loss checkpoint "
                        "(best.pth) instead of the final-epoch save, closing "
                        "the off-trajectory-save class (VERDICT r4 weak #2); "
                        "0 = legacy final-epoch policy")
    p.add_argument("--occlusion", type=int, default=0,
                   help="1 = generate the splits with LiDAR shadowing "
                        "(data/synthetic.py): boxes fully hidden from one "
                        "agent stay visible to neighbors, so the matrix "
                        "resolves collaboration gaps instead of saturating")
    p.add_argument("--summarize", action="store_true", help="only print the table")
    p.add_argument("--extra_evals", action="store_true",
                   help="eval-only robustness rows (pose noise, late fusion) "
                        "over the already-trained matrix checkpoints")
    p.add_argument("--track_evals", action="store_true",
                   help="tracking rows (SORT + CLEAR-MOT over matrix "
                        "checkpoints' val detections) with error bars")
    args = p.parse_args(argv)
    out_path = args.out or os.path.join(args.root, "results.json")

    results = load_results(out_path)
    if args.summarize:
        summarize(results, list(args.configs) + list(EXTRA_EVALS), args.seeds)
        return
    if args.extra_evals:
        run_extra_evals(args, results, out_path)
        summarize(results, list(args.configs) + list(EXTRA_EVALS), args.seeds)
        return
    if args.track_evals:
        run_track_evals(args, results, out_path)
        summarize(results, list(args.configs) + list(EXTRA_EVALS), args.seeds)
        return

    gen_synthetic("tools/det/create_data_det.py", args.root, args.grid,
                  {"train": args.train_scenes, "val": args.val_scenes},
                  args.frames,
                  extra=["--occlusion", "1"] if args.occlusion else None)
    # upperbound first within each seed: disco_kd needs its checkpoint
    order = sorted(args.configs, key=lambda c: (c != "upperbound"))
    for seed in args.seeds:
        for name in order:
            run_cell(name, seed, args, results, out_path)
    summarize(results, args.configs, args.seeds)


if __name__ == "__main__":
    main()
