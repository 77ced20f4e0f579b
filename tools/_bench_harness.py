"""Shared machinery for the resumable quality-benchmark harnesses.

tools/bench_quality.py (det operating-point matrix) and tools/bench_seg_ab.py
(seg backbone A/B) both run (config x seed) cells through the real CLIs and
accumulate results in a JSON file so interrupted matrices resume. The logged
subprocess runner, the results store, synthetic-data generation, and the
gap-vs-noise significance check live here so a fix to one harness (e.g. the
pose-noise unit bug) cannot silently miss the other.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def provenance(args, flags=(), stage="train", loss_path=None) -> dict:
    """Code-version + protocol stamp for a result cell (VERDICT r3 #6).

    The round-3 matrix ran from a worktree pinned at one sha while HEAD moved
    to a different (exact-math-equal) loss path; nothing in the artifact
    recorded which. Every cell now self-describes: the git sha of the code
    that ran it, the protocol parameters that shape the numbers (grid,
    nepoch), the fusion layer if pinned by the cell's flags, and the loss
    path the training CLI will take (read from the checkout's config default,
    since the harness runs the CLIs as subprocesses of this checkout —
    importing the package here would drag jax into the orchestrator).
    Cells WITHOUT a ``prov`` entry predate this stamp: they ran at 90bb8fc
    (view-path loss, 64-grid, nepoch 100 — see results/README.md).

    ``stage`` qualifies what the sha/loss_path describe: ``"train"`` = the
    cell trained under this checkout in this run; ``"eval-only"`` /
    ``"eval-resume"`` = only the evaluation ran here — the checkpoint may
    have been trained earlier under different code, and this stamp must not
    claim otherwise (the exact misattribution VERDICT r3 #6 is about).
    ``loss_path`` overrides the config-derived value (e.g. seg cells train
    cross-entropy; the det packed/view distinction does not apply)."""
    try:
        sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True, cwd=REPO,
                             timeout=30).stdout.strip() or "unknown"
    except Exception:
        sha = "unknown"
    flags = list(flags)
    layer = None
    if "--layer" in flags:
        i = flags.index("--layer")
        # guard the parse: a flags list ending in '--layer' or carrying a
        # non-integer value must stamp layer=None, not crash at stamp time —
        # i.e. AFTER the cell's training completed (ADVICE r4)
        if i + 1 < len(flags):
            try:
                layer = int(flags[i + 1])
            except ValueError:
                layer = None
    if loss_path is None:
        try:
            with open(os.path.join(REPO, "disconet_tpu", "config.py")) as f:
                m = re.search(r"packed_loss:\s*bool\s*=\s*(True|False)", f.read())
            # regex miss -> honest "unknown", never a confident wrong value
            loss_path = ("unknown" if m is None
                         else "packed" if m.group(1) == "True" else "view")
        except OSError:
            loss_path = "unknown"
    out = {"sha": sha, "grid": getattr(args, "grid", None),
           "nepoch": getattr(args, "nepoch", None), "layer": layer,
           "loss_path": loss_path, "stage": stage}
    # P trim (train-only, exact-semantics when P >= max positives — r4 P
    # sweep): stamped only when the harness overrode the config default, so
    # legacy cells' prov schema is unchanged
    mp = getattr(args, "max_pos", 0)
    if mp:
        out["max_pos"] = mp
    return out


def sh(cmd, log_file, capture: bool = False) -> str:
    """Run ``cmd`` from the repo root, appending the command line and all
    output to ``log_file``. Raises on a non-zero exit. With ``capture`` the
    combined stdout+stderr is also returned (for table parsing)."""
    with open(log_file, "a") as f:
        f.write("\n$ " + " ".join(cmd) + "\n")
        f.flush()
        if capture:
            r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
            f.write(r.stdout + r.stderr)
        else:
            r = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT, cwd=REPO)
    if r.returncode != 0:
        raise RuntimeError(f"command failed (see {log_file}): {' '.join(cmd)}")
    return (r.stdout or "") if capture else ""


def with_retries(what: str, fn, attempts: int = 3, sleep_s: float = 90.0):
    """Run ``fn()`` retrying on RuntimeError. The TPU tunnel occasionally
    throws a transient FAILED_PRECONDITION mid-subprocess (observed killing a
    4-hour matrix at seed1/v2v); cells are cheap to redo and results are
    resumable, so per-cell retries beat dying. The last failure propagates."""
    for attempt in range(1, attempts + 1):
        try:
            return fn()
        except RuntimeError as e:
            if attempt == attempts:
                raise
            print(f"[retry] {what}: attempt {attempt} failed ({e}); "
                  f"retrying in {sleep_s:.0f}s", flush=True)
            time.sleep(sleep_s)


def gen_synthetic(create_cli: str, root: str, grid: int,
                  split_scenes: dict, frames: int,
                  extra: list | None = None) -> None:
    """Generate synthetic splits via a tools/*/create_data_*.py CLI (skipping
    splits that already exist). ``split_scenes`` maps split name -> #scenes."""
    os.makedirs(root, exist_ok=True)
    for split, scenes in split_scenes.items():
        out = os.path.join(root, split)
        if os.path.isdir(out) and os.listdir(out):
            continue
        sh([sys.executable, create_cli, "--mode", "synthetic",
            "--savepath", root, "--split", split, "--scenes", str(scenes),
            "--frames", str(frames), "--grid", str(grid), *(extra or [])],
           os.path.join(root, "gen.log"))


def load_results(out_path: str) -> dict:
    if os.path.exists(out_path):
        with open(out_path) as f:
            return json.load(f)
    return {}


def save_results(results: dict, out_path: str) -> None:
    """Merge-on-save under a file lock: overlay the in-memory cells onto
    whatever is on disk NOW, not at load time. A harness that loaded the
    file earlier (or a second harness resuming the same matrix) must only
    add/update its own cells — a plain overwrite drops every cell another
    process completed after our load (observed: a stale seed-1 pass erased
    the seed-0 lowerbound/disco_kd rows written by a concurrent finisher).
    ``flock`` around the read-merge-replace closes the remaining
    lost-update window between two simultaneous savers; the write itself is
    atomic (temp file + rename) so a kill mid-save can't truncate the JSON.
    The merged view is folded back into ``results`` so skip checks also see
    cells finished elsewhere. (Known limit: a process holding a stale copy
    of a key still wins over a concurrent RE-measurement of that same key —
    acceptable, cells are append-once in practice.)"""
    import fcntl

    lock_path = out_path + ".lock"
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        merged = load_results(out_path)
        merged.update(results)
        results.update(merged)
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        os.replace(tmp, out_path)


def ordering_stats(hi, lo) -> dict:
    """Pure ordering-claim statistics: gap between two seed-arrays of a
    metric, combined per-point std, and the verdict.

    A single seed has std 0, so any nonzero gap would read SIGNIFICANT — a
    pure artifact (VERDICT r2 weak #3). With n < 2 on either side there is no
    noise estimate, so no verdict is issued. Single source of the semantics
    for both the console summarize (gap_vs_noise) and the markdown renderer
    (tools/results_to_md.py --orderings)."""
    import numpy as np

    hi, lo = np.asarray(hi), np.asarray(lo)
    gap = float(np.mean(hi) - np.mean(lo))
    n_hi, n_lo = len(hi), len(lo)
    if n_hi < 2 or n_lo < 2:
        return {"gap": gap, "noise": None, "n_hi": n_hi, "n_lo": n_lo,
                "verdict": "no verdict (n<2)"}
    noise = float(np.sqrt(np.std(hi) ** 2 + np.std(lo) ** 2))
    verdict = "SIGNIFICANT" if abs(gap) > noise else "within noise"
    return {"gap": gap, "noise": noise, "n_hi": n_hi, "n_lo": n_lo,
            "verdict": verdict}


def gap_vs_noise(label: str, hi, lo) -> str:
    """Print an ordering claim checked against its own noise floor; returns
    the verdict string so tests can assert on it."""
    s = ordering_stats(hi, lo)
    if s["noise"] is None:
        print(f"  {label}: {s['gap']:+.4f} (n={s['n_hi']} vs n={s['n_lo']}) "
              f"-> {s['verdict']}")
    else:
        print(f"  {label}: {s['gap']:+.4f} (noise {s['noise']:.4f}, "
              f"n={s['n_hi']} vs n={s['n_lo']}) -> {s['verdict']}")
    return s["verdict"]
