"""Unit tests for the quality-benchmark harness statistics (tools/_bench_harness.py).

VERDICT r2 weak #3: std of a single-seed array is 0, so gap_vs_noise used to
print SIGNIFICANT for any nonzero gap at n=1. It must refuse a verdict unless
both sides have >= 2 seeds.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from _bench_harness import (  # noqa: E402
    gap_vs_noise, load_results, provenance, save_results)


def test_n1_refuses_verdict():
    assert gap_vs_noise("a - b", [0.5], [0.3]) == "no verdict (n<2)"
    assert gap_vs_noise("a - b", [0.5, 0.6], [0.3]) == "no verdict (n<2)"
    assert gap_vs_noise("a - b", [0.5], [0.3, 0.2]) == "no verdict (n<2)"


def test_significant_when_gap_exceeds_combined_std():
    # gap 0.2, stds ~0.005 each -> significant
    assert gap_vs_noise("a - b", [0.50, 0.51], [0.30, 0.31]) == "SIGNIFICANT"


def test_within_noise_when_gap_below_combined_std():
    # gap 0.01, stds 0.05 each -> within noise
    assert gap_vs_noise("a - b", [0.45, 0.55], [0.44, 0.54]) == "within noise"


def test_save_results_merges_with_disk(tmp_path):
    """A harness holding a stale in-memory dict must not drop cells another
    process wrote after its load (observed round 3: a resumed seed-1 pass
    erased the seed-0 cells a concurrent finisher had added)."""
    out = str(tmp_path / "results.json")
    # process A loads (empty), process B completes a cell and saves
    a = load_results(out)
    b = load_results(out)
    b["cellB/seed0"] = {"mAP@0.7": 0.4}
    save_results(b, out)
    # A, unaware of B's cell, saves its own cell: B's must survive
    a["cellA/seed0"] = {"mAP@0.7": 0.3}
    save_results(a, out)
    on_disk = load_results(out)
    assert on_disk == {"cellA/seed0": {"mAP@0.7": 0.3},
                       "cellB/seed0": {"mAP@0.7": 0.4}}
    # and the merged view is folded back so A's skip checks see B's cell
    assert "cellB/seed0" in a


def test_epoch_loss_stats_parses_loss_not_cls_loss(tmp_path):
    """The save-point stamp must read the TOTAL end-of-epoch loss: a naive
    'loss=' regex matches the 'cls_loss=' substring first and hid the
    observed 43x final-dispatch spike behind a healthy-looking cls term."""
    import bench_quality

    log = tmp_path / "cell.log"
    log.write_text(
        "[ 1.0s] epoch 1 done step 48: cls_loss=0.00547 grad_norm=0.6 "
        "loss=0.42639 reg_loss=0.21 scenes_per_sec=3.0\n"
        "[ 2.0s] epoch 2 step 90: cls_loss=0.1 loss=9.9 reg_loss=0.1\n"  # mid-epoch: ignored
        "[ 2.5s] epoch 2 done step 96: cls_loss=0.00041 grad_norm=0.2 "
        "loss=0.00599 reg_loss=0.003 scenes_per_sec=40.0\n"
        "[ 3.0s] epoch 3 done step 144: cls_loss=0.00137 grad_norm=1.7 "
        "loss=0.25530 reg_loss=0.127 scenes_per_sec=22.8\n")
    st = bench_quality.epoch_loss_stats(str(log))
    assert st == {"final_epoch_loss": 0.2553, "min_epoch_loss": 0.00599}
    assert bench_quality.epoch_loss_stats(str(tmp_path / "missing.log")) == {}


def test_epoch_loss_stats_nonfinite_final_epoch_flags_cell(tmp_path):
    """A diverged final epoch prints 'loss=nan'; it must become the JSON-safe
    NONFINITE_LOSS sentinel, not silently fall back to the last finite
    epoch's healthy value (which would evade --max_loss_ratio exactly when
    the save is most broken)."""
    import bench_quality

    log = tmp_path / "cell.log"
    log.write_text(
        "[ 1.0s] epoch 1 done step 48: cls_loss=0.005 grad_norm=0.6 "
        "loss=0.00600 reg_loss=0.21 scenes_per_sec=3.0\n"
        "[ 2.0s] epoch 2 done step 96: cls_loss=nan grad_norm=nan "
        "loss=nan reg_loss=nan scenes_per_sec=40.0\n")
    st = bench_quality.epoch_loss_stats(str(log))
    assert st["final_epoch_loss"] == bench_quality.NONFINITE_LOSS
    assert st["min_epoch_loss"] == 0.006


def test_provenance_stamps_sha_protocol_and_loss_path():
    """VERDICT r3 #6: every cell must self-describe — the round-3 matrix ran
    from a pinned worktree while HEAD changed the loss path, and nothing in
    the artifact recorded which code produced which row."""
    import argparse

    args = argparse.Namespace(grid=64, nepoch=100)
    p = provenance(args, ["--com", "disco", "--layer", "2"])
    assert set(p) == {"sha", "grid", "nepoch", "layer", "loss_path", "stage"}
    assert p["grid"] == 64 and p["nepoch"] == 100 and p["layer"] == 2
    # a harness-level P override is stamped; the default (0) leaves the
    # legacy prov schema untouched
    args_mp = argparse.Namespace(grid=256, nepoch=100, max_pos=1024)
    assert provenance(args_mp, [])["max_pos"] == 1024
    assert "max_pos" not in provenance(
        argparse.Namespace(grid=256, nepoch=100, max_pos=0), [])
    # this repo is a git checkout and config.py declares packed_loss
    assert p["sha"] not in ("", "unknown") and len(p["sha"]) >= 7
    assert p["loss_path"] in ("packed", "view")
    assert p["stage"] == "train"  # default
    # flags without --layer -> layer None (CLI default applies)
    assert provenance(args, ["--bound", "lowerbound"])["layer"] is None
    # eval of an earlier-trained checkpoint must not claim train provenance
    assert provenance(args, [], stage="eval-only")["stage"] == "eval-only"
    # seg (cross-entropy) overrides the det packed/view vocabulary
    assert (provenance(args, [], loss_path="n/a (seg CE)")["loss_path"]
            == "n/a (seg CE)")


def test_epoch_loss_stats_negative_inf_loss(tmp_path):
    """ADVICE r4: with the numeric alternative first, 'loss=-inf' matched the
    bare '-' and float('-') raised — crashing run_cell after the expensive
    training and before save_results. Both -inf and inf must parse to the
    NONFINITE_LOSS sentinel."""
    import bench_quality

    log = tmp_path / "cell.log"
    log.write_text(
        "[ 1.0s] epoch 1 done step 48: cls_loss=0.005 grad_norm=0.6 "
        "loss=0.00600 reg_loss=0.21 scenes_per_sec=3.0\n"
        "[ 2.0s] epoch 2 done step 96: cls_loss=-inf grad_norm=inf "
        "loss=-inf reg_loss=-inf scenes_per_sec=40.0\n")
    st = bench_quality.epoch_loss_stats(str(log))
    assert st["final_epoch_loss"] == bench_quality.NONFINITE_LOSS
    assert st["min_epoch_loss"] == 0.006


def test_epoch_loss_stats_ignores_earlier_crashed_attempt(tmp_path):
    """ADVICE r4: with_retries re-runs a crashed train command appending to
    the same log; min_epoch_loss must come from the LAST attempt's trajectory
    only (the one whose checkpoint survived), not a discarded earlier run."""
    import bench_quality

    log = tmp_path / "cell.log"
    log.write_text(
        "\n$ python tools/det/train_codet.py --data x --com disco\n"
        "[ 1.0s] epoch 1 done step 48: loss=0.00100 scenes_per_sec=3.0\n"
        "crash\n"
        "\n$ python tools/det/train_codet.py --data x --com disco\n"
        "[ 1.0s] epoch 1 done step 48: loss=0.50000 scenes_per_sec=3.0\n"
        "[ 2.0s] epoch 2 done step 96: loss=0.04000 scenes_per_sec=3.0\n"
        "\n$ python tools/det/test_codet.py --data x --com disco\n")
    st = bench_quality.epoch_loss_stats(str(log))
    # 0.001 belongs to the crashed first attempt — it must not be the min
    assert st == {"final_epoch_loss": 0.04, "min_epoch_loss": 0.04}


def test_provenance_layer_flag_guarded():
    """ADVICE r4: a flags list ending in '--layer' (or a non-integer value)
    must stamp layer=None instead of raising at stamp time — i.e. after the
    cell's training completed."""
    import argparse

    args = argparse.Namespace(grid=64, nepoch=100)
    assert provenance(args, ["--com", "disco", "--layer"])["layer"] is None
    assert provenance(args, ["--layer", "auto"])["layer"] is None


def test_best_ckpt_stats_parses_last_record_of_last_attempt(tmp_path):
    """--save_best stamp: the harness reads the train CLI's 'best checkpoint'
    record line — last write wins, and earlier crashed attempts are ignored
    like epoch_loss_stats does."""
    import bench_quality

    log = tmp_path / "cell.log"
    log.write_text(
        "\n$ python tools/det/train_codet.py --data x --com disco --save_best 1\n"
        "best checkpoint: epoch 1 loss=0.90000 -> /x/best.pth\n"
        "crash\n"
        "\n$ python tools/det/train_codet.py --data x --com disco --save_best 1\n"
        "best checkpoint: epoch 50 loss=0.01000 -> /x/best.pth\n"
        "best checkpoint: epoch 97 loss=0.00599 -> /x/best.pth\n")
    st = bench_quality.best_ckpt_stats(str(log))
    assert st == {"best_epoch": 97, "best_epoch_loss": 0.00599}
    assert bench_quality.best_ckpt_stats(str(tmp_path / "missing.log")) == {}


def test_cell_ckpt_selection(tmp_path):
    """cell_ckpt: save_best cells measure best.pth, legacy cells the final
    epoch export; eval-only passes (save_best=None) prefer best.pth exactly
    when the training cell saved one — so derived rows (tracking, robustness)
    score the same weights the cell's mAP row did."""
    import bench_quality

    logpath = str(tmp_path)
    mode = tmp_path / "disco"  # disco_l2 -> MODE_DIR 'disco'
    mode.mkdir()
    best = str(mode / "best.pth")
    final = str(mode / "epoch_100.pth")
    assert bench_quality.cell_ckpt(logpath, "disco_l2", 100, True) == best
    assert bench_quality.cell_ckpt(logpath, "disco_l2", 100, False) == final
    # eval-only: no best.pth on disk -> final; best.pth on disk -> best
    assert bench_quality.cell_ckpt(logpath, "disco_l2", 100, None) == final
    (mode / "best.pth").write_bytes(b"x")
    assert bench_quality.cell_ckpt(logpath, "disco_l2", 100, None) == best
