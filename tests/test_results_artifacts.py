"""Integrity of the committed results/ artifacts (the measured-claim store).

Every quality claim in BASELINE.md renders from a JSON file under results/
(VERDICT r2: no claim may live only under /tmp). These tests pin the
invariants the renderer and the docs rely on, so a malformed merge, a
truncated save, or a cell written without its provenance stamp fails CI
instead of silently rendering wrong tables. Pure-python (no jax import).
"""

from __future__ import annotations

import json
import os
import re

import pytest

RESULTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results")
ARTIFACTS = [f for f in sorted(os.listdir(RESULTS)) if f.endswith(".json")]
CELL_RE = re.compile(r"(.+)/seed(\d+)")


def load(name):
    with open(os.path.join(RESULTS, name)) as f:
        return json.load(f)


# artifacts that are not (config x seed) matrices: single-measurement reports
NON_MATRIX = {"kd_attribution.json"}


@pytest.mark.parametrize("name", ARTIFACTS)
def test_artifact_parses_and_cells_have_metrics(name):
    d = load(name)
    cells = {k: v for k, v in d.items() if CELL_RE.fullmatch(k)}
    if name in NON_MATRIX:
        assert not cells and d, f"{name}: unexpected matrix cells"
        return
    assert cells, f"{name}: no config/seedN cells"
    for key, cell in cells.items():
        assert isinstance(cell, dict), f"{name}:{key} not a dict"
        # every cell carries at least one known metric, in range
        metrics = {m: cell[m] for m in
                   ("mAP@0.5", "mAP@0.7", "mIoU", "MOTA", "MOTP") if m in cell}
        assert metrics, f"{name}:{key} has no known metric"
        for m, v in metrics.items():
            # MOTA can be negative (CLEAR-MOT); everything else is [0, 1]
            lo = -1.0 if m == "MOTA" else 0.0
            assert lo <= v <= 1.0, f"{name}:{key} {m}={v} out of range"


@pytest.mark.parametrize("name", ARTIFACTS)
def test_post_r4_cells_are_provenance_stamped(name):
    """Cells written after the r4 stamp landed must self-describe; files
    carrying unstamped legacy cells must backfill via _provenance (the
    documented convention in results/README.md)."""
    d = load(name)
    legacy = 0
    for key, cell in d.items():
        if not CELL_RE.fullmatch(key):
            continue
        if "prov" in cell:
            prov = cell["prov"]
            # 'stage' arrived mid-r4 (49a2151); earlier stamped cells carry
            # the r4 core keys only
            assert {"sha", "grid", "nepoch"} <= set(prov), \
                f"{name}:{key} prov incomplete: {prov}"
        else:
            legacy += 1
    if legacy:
        assert "_provenance" in d, \
            f"{name}: {legacy} unstamped cells but no _provenance backfill"


def test_256_bracket_save_policy_stamps():
    """The r5 reference-geometry cells are best-of-epoch saves and say so
    (ckpt='best' + best_epoch stats) — the save-point-policy fix the round-4
    verdict asked for, checkable from the artifact alone."""
    d = load("occluded256_pair.json")
    best_cells = [k for k, v in d.items()
                  if CELL_RE.fullmatch(k) and v.get("ckpt") == "best"]
    assert len(best_cells) >= 8  # upperbound/kd seeds 1,2,4 + disco 1,4 + lb 4,5
    for k in best_cells:
        cell = d[k]
        assert "best_epoch" in cell and "best_epoch_loss" in cell, k
        # the snapshot is an end-of-epoch state within the schedule
        assert 1 <= cell["best_epoch"] <= cell["prov"]["nepoch"], k


def test_orderings_render_with_verdicts():
    """The headline Table-1 orderings at the reference geometry must render
    real verdicts (n>=2 on both sides), not n<2 refusals — the round-4
    verdict's top ask."""
    sys_path_tools = os.path.join(os.path.dirname(RESULTS), "tools")
    import sys
    sys.path.insert(0, sys_path_tools)
    try:
        from _bench_harness import ordering_stats
    finally:
        sys.path.remove(sys_path_tools)
    d = load("occluded256_pair.json")

    def col(name):
        return [v["mAP@0.7"] for k, v in d.items()
                if CELL_RE.fullmatch(k) and k.split("/")[0] == name]

    for hi, lo in [("upperbound", "lowerbound"), ("disco_kd", "disco"),
                   ("disco", "lowerbound"), ("disco_kd", "lowerbound")]:
        s = ordering_stats(col(hi), col(lo))
        assert s["verdict"] != "no verdict (n<2)", (hi, lo, s)
        assert s["gap"] > 0, (hi, lo, s)
