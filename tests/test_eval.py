"""Evaluation metric tests (SURVEY.md C10/C26): mAP on canned det/gt sets,
CLEAR-MOT accounting, SORT association."""

import numpy as np

from disconet_tpu.evaluation.mean_ap import average_precision, eval_map, tpfp_default
from disconet_tpu.evaluation.mot import clear_mot


def _box(cx, cy, w=2.0, l=4.0, th=0.0):
    return np.array([cx, cy, w, l, th], np.float64)


def test_tpfp_perfect_and_fp():
    gt = np.stack([_box(0, 0), _box(10, 10)])
    dets = np.stack([_box(0, 0), _box(10, 10), _box(30, 30)])
    scores = np.array([0.9, 0.8, 0.7])
    tp, fp = tpfp_default(dets, scores, gt, iou_thr=0.5)
    np.testing.assert_array_equal(tp, [1, 1, 0])
    np.testing.assert_array_equal(fp, [0, 0, 1])


def test_tpfp_duplicate_detection_is_fp():
    """A second detection on the same gt must count as FP (mmdet-v1 rule)."""
    gt = np.stack([_box(0, 0)])
    dets = np.stack([_box(0, 0), _box(0.1, 0)])
    scores = np.array([0.9, 0.8])
    tp, fp = tpfp_default(dets, scores, gt, iou_thr=0.5)
    assert tp.sum() == 1 and fp.sum() == 1
    # the higher-scoring det wins the gt
    assert tp[0] == 1 and fp[1] == 1


def test_eval_map_perfect():
    frames = [
        (np.stack([_box(0, 0), _box(8, 8)]), np.array([0.9, 0.8])),
        (np.stack([_box(-5, 3)]), np.array([0.95])),
    ]
    gts = [np.stack([_box(0, 0), _box(8, 8)]), np.stack([_box(-5, 3)])]
    ap, d = eval_map(frames, gts, iou_thr=0.5)
    assert abs(ap - 1.0) < 1e-6
    assert d["num_gts"] == 3


def test_eval_map_none_detected():
    ap, _ = eval_map([(np.zeros((0, 5)), np.zeros(0))], [np.stack([_box(0, 0)])], 0.5)
    assert ap == 0.0


def test_average_precision_area():
    # single det matching single gt at score s: recall 0->1, precision 1
    ap = average_precision(np.array([1.0]), np.array([1.0]))
    assert abs(ap - 1.0) < 1e-9
    ap = average_precision(np.array([0.5, 1.0]), np.array([1.0, 0.5]))
    assert 0.5 < ap <= 1.0


def test_clear_mot_perfect():
    seq_gt = [
        (np.stack([_box(0, 0), _box(10, 0)]), np.array([1, 2])),
        (np.stack([_box(1, 0), _box(11, 0)]), np.array([1, 2])),
    ]
    seq_hyp = [
        (np.stack([_box(0, 0), _box(10, 0)]), np.array([7, 8])),
        (np.stack([_box(1, 0), _box(11, 0)]), np.array([7, 8])),
    ]
    r = clear_mot(seq_gt, seq_hyp, iou_threshold=0.5)
    assert r["MOTA"] == 1.0
    assert r["id_switches"] == 0
    assert r["MOTP"] > 0.99


def test_clear_mot_id_switch_counted():
    seq_gt = [
        (np.stack([_box(0, 0)]), np.array([1])),
        (np.stack([_box(1, 0)]), np.array([1])),
    ]
    # hypothesis changes id between frames -> 1 switch
    seq_hyp = [
        (np.stack([_box(0, 0)]), np.array([7])),
        (np.stack([_box(1, 0)]), np.array([9])),
    ]
    r = clear_mot(seq_gt, seq_hyp, iou_threshold=0.5)
    assert r["id_switches"] == 1
    assert r["MOTA"] == 0.5  # 1 switch over 2 gt


def test_clear_mot_one_hypothesis_matches_at_most_one_gt():
    """Stale correspondences can map two gt ids to the same hyp id; step 1
    must stay one-to-one — double-matching inflated matches/MOTA (a single
    hypothesis vs two present gts must score 1 match + 1 miss)."""
    b = _box(0, 0)
    b2 = _box(0.2, 0)  # overlaps b at IoU > 0.5
    seq_gt = [
        (np.stack([b]), np.array([1])),          # gt1 <-> h5
        (np.stack([b2]), np.array([2])),         # gt1 absent; gt2 <-> h5
        (np.stack([b, b2]), np.array([1, 2])),   # both present, one hypothesis
    ]
    seq_hyp = [(np.stack([b]), np.array([5]))] * 3
    r = clear_mot(seq_gt, seq_hyp, iou_threshold=0.5)
    assert r["matches"] == 3  # one per frame, never two in frame 3
    assert r["misses"] == 1
    assert r["MOTA"] == 1.0 - 1.0 / 4.0


def test_clear_mot_miss_and_fp():
    seq_gt = [(np.stack([_box(0, 0)]), np.array([1]))]
    seq_hyp = [(np.stack([_box(50, 50)]), np.array([3]))]
    r = clear_mot(seq_gt, seq_hyp, iou_threshold=0.5)
    assert r["misses"] == 1 and r["false_positives"] == 1
    assert r["MOTA"] == -1.0


def test_clear_mot_mt_ml_frag():
    """Trajectory-level CLEAR extensions (VERDICT r1 #6): gt 1 is tracked
    5/5 frames (MT), gt 2 is tracked frames 1,2,5 of 5 with a gap (PT at 60%,
    one fragmentation), gt 3 is tracked 0/5 (ML)."""
    far = _box(50, 50)
    b1, b2, b3 = _box(0, 0), _box(20, 0), _box(40, 0)
    seq_gt, seq_hyp = [], []
    hyp2_present = [True, True, False, False, True]
    for f in range(5):
        seq_gt.append((np.stack([b1, b2, b3]), np.array([1, 2, 3])))
        hyps, ids = [b1], [10]
        if hyp2_present[f]:
            hyps.append(b2)
            ids.append(20)
        seq_hyp.append((np.stack(hyps), np.array(ids)))
    r = clear_mot(seq_gt, seq_hyp, iou_threshold=0.5)
    assert r["num_trajectories"] == 3
    assert r["MT"] == 1 and r["PT"] == 1 and r["ML"] == 1
    assert r["FRAG"] == 1
    # gt3 never matched: 5 misses; gt2 missed twice
    assert r["misses"] == 7 and r["false_positives"] == 0


def test_clear_mot_frag_counts_each_interruption():
    b = _box(0, 0)
    pattern = [True, False, True, False, True]  # two interruptions
    seq_gt = [(np.stack([b]), np.array([1]))] * 5
    seq_hyp = [
        (np.stack([b]) if p else np.zeros((0, 5)), np.array([4]) if p else np.zeros(0, int))
        for p in pattern
    ]
    r = clear_mot(seq_gt, seq_hyp, iou_threshold=0.5)
    assert r["FRAG"] == 2
    assert r["MT"] == 0 and r["PT"] == 1  # 3/5 = 60% tracked


def test_sort_tracks_moving_box():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools", "track"))
    from sort import Sort

    tracker = Sort(max_age=2, min_hits=1, iou_threshold=0.1)
    ids = []
    for t in range(6):
        dets = np.array([[t * 1.0, 0.0, 2.0, 4.0, 0.0, 0.9]])
        out = tracker.update(dets)
        assert len(out) == 1
        ids.append(int(out[0, 6]))
    # one stable identity across the whole sequence
    assert len(set(ids)) == 1


def test_sort_two_objects_no_swap():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools", "track"))
    from sort import Sort

    tracker = Sort(max_age=2, min_hits=1, iou_threshold=0.05)
    id_a, id_b = None, None
    for t in range(5):
        dets = np.array(
            [
                [t * 0.8, 0.0, 2.0, 4.0, 0.0, 0.9],
                [20.0 - t * 0.8, 10.0, 2.0, 4.0, 0.0, 0.9],
            ]
        )
        out = tracker.update(dets)
        assert len(out) == 2
        by_y = sorted(out.tolist(), key=lambda r: r[1])
        if id_a is None:
            id_a, id_b = int(by_y[0][6]), int(by_y[1][6])
        else:
            assert int(by_y[0][6]) == id_a and int(by_y[1][6]) == id_b


def test_eval_map_multiclass_per_class_and_mean():
    """Per-class scoring (reference per-class NMS + mean_ap semantics): a
    correct box with the wrong class is a FP for its class and a miss for the
    gt's class; classes with zero gt are excluded from the mean."""
    from disconet_tpu.evaluation import eval_map_multiclass

    box = np.array([[0.0, 0.0, 2.0, 4.0, 0.0]], np.float32)
    score = np.array([0.9], np.float32)
    # frame 1: class-1 gt detected as class 1 (TP); frame 2: class-2 gt
    # detected as class 3 (FP for 3, miss for 2)
    dets = [(box, score, np.array([1])), (box, score, np.array([3]))]
    gts = [(box, np.array([1])), (box, np.array([2]))]
    mean, d = eval_map_multiclass(dets, gts, iou_thr=0.5, num_classes=4)
    per = d["per_class"]
    assert per[1]["ap"] == 1.0 and per[1]["num_gts"] == 1
    assert per[2]["ap"] == 0.0 and per[2]["num_gts"] == 1
    assert per[3]["num_gts"] == 0 and per[3]["num_dets"] == 1
    # mean over classes WITH gt only: (1.0 + 0.0) / 2
    assert abs(mean - 0.5) < 1e-9
    assert d["num_gts"] == 2 and d["num_dets"] == 2
