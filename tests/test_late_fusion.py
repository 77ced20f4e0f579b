"""Late-fusion helper tests (SURVEY.md C8)."""

import numpy as np

from disconet_tpu.ops.late_fusion import late_fusion, nms_np, transform_boxes


def _pose(x, y, yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4, dtype=np.float32)
    T[0, 0], T[0, 1], T[1, 0], T[1, 1] = c, -s, s, c
    T[0, 3], T[1, 3] = x, y
    return T


def test_transform_boxes_roundtrip():
    T = _pose(3.0, -2.0, 0.7)
    boxes = np.array([[1.0, 2.0, 2.0, 4.0, 0.3]], np.float32)
    back = transform_boxes(transform_boxes(boxes, T), np.linalg.inv(T))
    np.testing.assert_allclose(back, boxes, atol=1e-5)


def test_nms_np_dedups():
    boxes = np.array(
        [[0, 0, 2, 4, 0.0], [0.05, 0, 2, 4, 0.0], [10, 10, 2, 4, 0.0]], np.float64
    )
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms_np(boxes, scores, iou_threshold=0.3)
    assert list(keep) == [0, 2]


def test_late_fusion_merges_across_frames():
    """The same physical object seen by two agents must merge into one box."""
    T_wa = _pose(0, 0, 0)
    T_wb = _pose(5.0, 0.0, np.pi / 2)
    # object at world (2, 1, theta 0.2)
    obj_w = np.array([[2.0, 1.0, 2.0, 4.0, 0.2]], np.float32)
    box_a = transform_boxes(obj_w, np.linalg.inv(T_wa))
    box_b = transform_boxes(obj_w, np.linalg.inv(T_wb))
    # plus one object only agent b sees
    only_b = transform_boxes(np.array([[8.0, 3.0, 2.0, 4.0, -0.5]], np.float32), np.linalg.inv(T_wb))
    dets = [
        (box_a, np.array([0.9], np.float32)),
        (np.concatenate([box_b, only_b]), np.array([0.8, 0.7], np.float32)),
    ]
    trans = np.zeros((2, 2, 4, 4), np.float32)
    for i, Ti in enumerate([T_wa, T_wb]):
        for j, Tj in enumerate([T_wa, T_wb]):
            trans[i, j] = np.linalg.inv(Ti) @ Tj

    fused_boxes, fused_scores = late_fusion(dets, trans, receiver=0, iou_threshold=0.1)
    assert len(fused_boxes) == 2  # duplicate collapsed, unique kept
    # receiver-frame position of the shared object survives at higher score
    np.testing.assert_allclose(fused_boxes[0][:2], obj_w[0][:2], atol=1e-4)
    assert fused_scores[0] == 0.9


def test_late_fusion_empty_inputs():
    trans = np.tile(np.eye(4, dtype=np.float32), (2, 2, 1, 1))
    b, s = late_fusion([(np.zeros((0, 5)), np.zeros(0))] * 2, trans, receiver=1)
    assert b.shape == (0, 5) and s.shape == (0,)
