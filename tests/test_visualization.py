"""Visualization smoke test (SURVEY.md C28)."""

import numpy as np

from disconet_tpu.config import tiny_config
from disconet_tpu.utils.visualization import render_bev


def test_render_bev_writes_png(tmp_path):
    cfg = tiny_config(32)
    H, W, Z = cfg.bev_shape
    rng = np.random.default_rng(0)
    bev = (rng.random((H, W, Z)) < 0.02).astype(np.float32)
    gt = np.array([[1.0, 2.0, 2.0, 4.0, 0.3]])
    det = np.array([[1.2, 2.1, 2.0, 4.0, 0.25]])
    fig = render_bev(cfg, bev, gt, det, np.array([0.9]))
    out = tmp_path / "bev.png"
    fig.savefig(str(out))
    assert out.stat().st_size > 5000  # a real rendered image, not an empty file


def test_render_bev_empty_boxes():
    cfg = tiny_config(32)
    bev = np.zeros(cfg.bev_shape, np.float32)
    fig = render_bev(cfg, bev, np.zeros((0, 5)), np.zeros((0, 5)), np.zeros(0))
    assert fig is not None


def test_render_seg_writes_png(tmp_path):
    from disconet_tpu.utils.visualization import render_seg

    rng = np.random.default_rng(0)
    pred = rng.integers(0, 8, (32, 32))
    label = rng.integers(0, 8, (32, 32))
    fig = render_seg(pred, label, num_classes=8,
                     class_names=["bg", "veh", "road", "ter", "side", "bld", "ped", "veg"])
    out = tmp_path / "seg.png"
    fig.savefig(str(out))
    assert out.stat().st_size > 5000


def test_render_edge_weights_no_present_senders():
    from disconet_tpu.utils.visualization import render_edge_weights

    fig = render_edge_weights(np.zeros((3, 4, 4)), np.zeros(3, bool), receiver=0)
    assert fig is not None
