"""End-to-end CLI integration (SURVEY.md §5.1 rebuild strategy: synthetic
mini-dataset through train -> checkpoint -> resume -> test -> track).

Runs the real CLIs in subprocesses on a 32-grid synthetic dataset. Slower than
unit tests (XLA compiles amortized by the persistent cache) — marked slow; run
with ``-m slow`` or as part of the full suite.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def _run(args, cwd=REPO):
    res = subprocess.run(
        [sys.executable, "-u"] + args, cwd=cwd, env=ENV, capture_output=True, text=True, timeout=540
    )
    assert res.returncode == 0, f"{args}\nSTDOUT:\n{res.stdout[-3000:]}\nSTDERR:\n{res.stderr[-3000:]}"
    return res.stdout


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli_data"))
    _run(["tools/det/create_data_det.py", "--savepath", root, "--split", "train",
          "--mode", "synthetic", "--scenes", "1", "--frames", "3", "--grid", "32"])
    return os.path.join(root, "train")


@pytest.mark.slow
def test_train_resume_test_track_cycle(data_root, tmp_path):
    logs = str(tmp_path / "logs")
    common = ["--data", data_root, "--grid", "32", "--batch", "2", "--logpath", logs]

    # train 2 epochs
    out = _run(["tools/det/train_codet.py", *common, "--bound", "lowerbound",
                "--nepoch", "2", "--log_every", "1", "--save_pth", "1"])
    assert "training complete" in out
    assert os.path.isfile(os.path.join(logs, "lowerbound", "epoch_2.pth"))

    # auto-resume continues from epoch 2 -> 3
    out = _run(["tools/det/train_codet.py", *common, "--bound", "lowerbound",
                "--nepoch", "3", "--log_every", "1", "--save_pth", "0",
                "--auto_resume_path", logs])
    assert "auto-resumed from epoch 2" in out

    # losses decreased across the run
    # evaluate from the orbax checkpoint, dumping tracking files
    out = _run(["tools/det/test_codet.py", *common, "--bound", "lowerbound",
                "--resume", os.path.join(logs, "lowerbound", "ckpt"), "--tracking"])
    assert "mAP@0.5" in out and "average" in out

    # evaluate from the .pth checkpoint: same det counts as orbax epoch-2 eval
    out_pth = _run(["tools/det/test_codet.py", *common, "--bound", "lowerbound",
                    "--resume", os.path.join(logs, "lowerbound", "epoch_2.pth")])
    assert "loaded checkpoint" in out_pth

    # padding robustness: 3 frames at batch 2 (padded tail) ~= batch 1, and
    # --resume may point at the log dir (ckpt/ resolution). NOT exact: XLA's
    # CPU conv codegen is not bitwise batch-size-invariant (f32-LSB / one
    # bf16-ULP head-output differences between the batch-1 and batch-2
    # graphs), so a marginal detection can flip across a score/IoU threshold.
    # The *no-leak* contract (pad frame never affects real frames at a fixed
    # batch shape) is bitwise and lives in
    # test_training.py::test_pad_frame_does_not_leak.
    def _map_table(s):
        rows = []
        for ln in s.splitlines():
            if "|" not in ln:
                continue
            cols = [c.strip() for c in ln.split("|")]
            rows.append(cols)
        return rows

    out_b1 = _run(["tools/det/test_codet.py", "--data", data_root, "--grid", "32",
                   "--batch", "1", "--logpath", logs, "--bound", "lowerbound",
                   "--resume", os.path.join(logs, "lowerbound")])
    t1, t2 = _map_table(out_b1), _map_table(out)
    assert len(t1) == len(t2) and len(t1) > 0, (out_b1, out)
    for r1, r2 in zip(t1, t2):
        assert r1[0] == r2[0], (r1, r2)  # agent label
        if r1[0] == "agent":  # header row
            continue
        assert abs(float(r1[1]) - float(r2[1])) <= 0.02, (r1, r2)  # mAP@0.5
        assert abs(float(r1[2]) - float(r2[2])) <= 0.02, (r1, r2)  # mAP@0.7
        assert r1[3] == r2[3], (r1, r2)  # GT count is data, must be exact
        det_tol = 6 if r1[0] == "average" else 2  # average sums per-agent flips
        assert abs(int(r1[4]) - int(r2[4])) <= det_tol, (r1, r2)

    # SORT + CLEAR-MOT over the dumps (README.md:86-91 directory convention:
    # {logpath}/{mode}/{no_rsu|with_rsu}/{split}/det_dumps)
    det_dir = os.path.join(logs, "lowerbound", "with_rsu", "test", "det_dumps")
    if os.path.isdir(det_dir) and os.listdir(det_dir):
        out = _run(["tools/track/sort.py", "--det_logs_path", det_dir,
                    "--out", os.path.join(logs, "tracks")])
        assert "tracked" in out
        out = _run(["tools/track/eval_mot.py", "--data", data_root,
                    "--tracks", os.path.join(logs, "tracks"), "--grid", "32"])
        assert "MOTA" in out


@pytest.mark.slow
def test_seg_cli_cycle(data_root, tmp_path):
    logs = str(tmp_path / "logs_seg")
    _run(["tools/seg/train_codet.py", "--data", data_root, "--grid", "32",
          "--batch", "2", "--nepoch", "1", "--logpath", logs, "--log_every", "1"])
    # batch 2 over 3 frames: last batch is padded (all-False agent_mask rows)
    out = _run(["tools/seg/test_codet.py", "--data", data_root, "--grid", "32",
                "--batch", "2",
                "--resume", os.path.join(logs, "lowerbound_seg", "ckpt")])
    assert "mIoU" in out


@pytest.mark.slow
def test_multiclass_train_test_cycle(tmp_path):
    """3-class det end to end (VERDICT r2 #5): --num_classes 4 data ->
    train -> test through multiclass_nms_decode -> per-class AP table."""
    root = str(tmp_path / "mc_data")
    logs = str(tmp_path / "logs_mc")
    _run(["tools/det/create_data_det.py", "--savepath", root, "--split", "train",
          "--mode", "synthetic", "--scenes", "1", "--frames", "3", "--grid", "32",
          "--num_classes", "4"])
    common = ["--data", os.path.join(root, "train"), "--grid", "32",
              "--num_classes", "4", "--batch", "2", "--logpath", logs]
    out = _run(["tools/det/train_codet.py", *common, "--bound", "lowerbound",
                "--nepoch", "2", "--log_every", "1", "--save_pth", "1"])
    assert "training complete" in out
    out = _run(["tools/det/test_codet.py", *common, "--bound", "lowerbound",
                "--resume", os.path.join(logs, "lowerbound", "epoch_2.pth")])
    # per-agent table plus the multi-class per-class AP table
    assert "average" in out
    assert "class" in out, out[-2000:]
    class_rows = [ln for ln in out.splitlines()
                  if ln.strip().startswith(("1 |", "2 |", "3 |"))]
    assert len(class_rows) >= 3, out[-2000:]
    # the per-class gt counts must sum to the average row's gt count
    import re as _re
    avg = _re.search(r"average \|\s+[\d.]+ \|\s+[\d.]+ \|\s+(\d+)", out)
    per_cls = _re.findall(r"^\s+[123] \|\s+[\d.]+ \|\s+[\d.]+ \|\s+(\d+)", out,
                          _re.MULTILINE)
    assert avg and sum(int(g) for g in per_cls[-3:]) == int(avg.group(1))


@pytest.mark.slow
def test_save_best_exports_min_loss_epoch(data_root, tmp_path):
    """--save_best (VERDICT r4 weak #2): training exports {logdir}/best.pth
    holding the min end-of-epoch-loss snapshot, prints the machine-readable
    record line the quality harness stamps cells with, and the export is a
    valid eval checkpoint. The recorded best loss must equal the min over the
    printed end-of-epoch losses."""
    import re

    logs = str(tmp_path / "logs")
    common = ["--data", data_root, "--grid", "32", "--batch", "2", "--logpath", logs]
    out = _run(["tools/det/train_codet.py", *common, "--bound", "lowerbound",
                "--nepoch", "3", "--log_every", "1", "--save_pth", "0",
                "--save_best", "1", "--ckpt_every", "3"])
    best_path = os.path.join(logs, "lowerbound", "best.pth")
    assert os.path.isfile(best_path)
    recs = re.findall(r"best checkpoint: epoch (\d+) loss=([\d.eE+-]+)", out)
    assert recs, out[-2000:]
    best_epoch, best_loss = int(recs[-1][0]), float(recs[-1][1])
    ep_losses = {int(e): float(v) for e, v in re.findall(
        r"epoch (\d+) done .*?(?<![\w])loss=([\d.eE+-]+)", out)}
    assert len(ep_losses) == 3
    assert best_loss == min(ep_losses.values())
    assert ep_losses[best_epoch] == best_loss
    # the export is a working checkpoint for the eval CLI
    out = _run(["tools/det/test_codet.py", *common, "--bound", "lowerbound",
                "--resume", best_path])
    assert "average" in out
