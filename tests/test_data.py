"""Data layer tests (SURVEY.md §5.1): schema round-trip, target assignment,
loader semantics (rsu / padding / upperbound)."""

import numpy as np
import pytest

from disconet_tpu.config import tiny_config
from disconet_tpu.data import schema
from disconet_tpu.data.dataset import V2XSimDet, collate_det, BatchIterator
from disconet_tpu.data.synthetic import generate_dataset, generate_scene, scene_to_frames
from disconet_tpu.data.targets import assign_targets, anchors_from_map
from disconet_tpu.ops.boxes import decode_boxes, make_anchors

CFG = tiny_config(32)


@pytest.fixture(scope="module")
def mini_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("v2x")
    generate_dataset(str(root), CFG, num_scenes=1, frames_per_scene=2, seed=5, num_agents=3)
    return str(root)


def test_schema_roundtrip(tmp_path):
    cfg = CFG
    scene = generate_scene(1, cfg, num_agents=2)
    frame = scene_to_frames(scene, cfg)[0]
    schema.save_frame(str(tmp_path), 0, 0, 0, frame)
    loaded = schema.load_frame(str(tmp_path / "agent0" / "0_0" / "0.npy"))
    for k in ("padded_voxel_points", "label_one_hot", "reg_target", "reg_loss_mask"):
        np.testing.assert_allclose(
            np.asarray(loaded[k], np.float32),
            np.asarray(frame[k], np.float32),
            atol=2e-3,  # reg_target values stored float16
            err_msg=k,
        )
    assert loaded["num_agent"] == 2


def test_assign_targets_roundtrip():
    """decode(reg_target) at each gt's best anchor must recover the gt box."""
    cfg = CFG
    anchors = make_anchors(cfg)
    gt = np.array([[1.0, 2.0, 2.0, 4.5, 0.3], [-2.0, -1.0, 1.8, 4.0, -1.2]], np.float32)
    tgt = assign_targets(gt, cfg, anchors=anchors)
    assert tgt["reg_loss_mask"].sum() >= 2
    flat_anchors = anchors.reshape(-1, 5)
    flat_reg = tgt["reg_target"].reshape(-1, 6)
    for g in range(len(gt)):
        iou, idx = tgt["gt_max_iou"][g]
        assert iou > 0.1
        dec = np.asarray(decode_boxes(flat_reg[int(idx)], flat_anchors[int(idx)]))
        np.testing.assert_allclose(dec[:4], gt[g, :4], atol=1e-3)
        # theta modulo pi-symmetric sin/cos code
        assert abs(np.sin(dec[4] - gt[g, 4])) < 1e-3


def test_assign_targets_crowded_gts_each_keep_a_positive():
    """Two heavily-overlapping gts competing for the same best anchor: the
    force-match must not be revocable — each gt keeps its own positive anchor
    (decode at some positive anchor recovers each gt)."""
    cfg = CFG
    anchors = make_anchors(cfg)
    gt = np.array(
        [[0.0, 0.0, 2.0, 4.5, 0.2], [0.4, 0.1, 2.0, 4.5, 0.2]], np.float32
    )
    tgt = assign_targets(gt, cfg, anchors=anchors)
    flat_anchors = anchors.reshape(-1, 5)
    flat_reg = tgt["reg_target"].reshape(-1, 6)
    pos = np.nonzero(tgt["reg_loss_mask"].reshape(-1))[0]
    assert len(pos) >= 2
    decoded = np.stack(
        [np.asarray(decode_boxes(flat_reg[k], flat_anchors[k])) for k in pos]
    )
    for g in range(len(gt)):
        d = np.abs(decoded[:, :4] - gt[g, :4]).max(axis=1)
        ang = np.abs(np.sin(decoded[:, 4] - gt[g, 4]))
        assert ((d < 1e-3) & (ang < 1e-3)).any(), f"gt {g} has no positive anchor"


def test_anchors_map_roundtrip():
    cfg = CFG
    anchors = make_anchors(cfg)
    tgt = assign_targets(np.zeros((0, 5)), cfg, anchors=anchors)
    rec = anchors_from_map(tgt["anchors_map"])
    np.testing.assert_allclose(rec[..., :4], anchors[..., :4], atol=1e-5)
    np.testing.assert_allclose(np.sin(rec[..., 4]), np.sin(anchors[..., 4]), atol=1e-5)


def test_dataset_shapes_and_masking(mini_root):
    ds = V2XSimDet(mini_root, CFG, rsu=True, pack_bits=False)
    assert len(ds) == 2
    item = ds[0]
    MA = CFG.max_agents
    H, W = CFG.map_dims
    assert item["bev"].shape == (MA, H, W, CFG.grid_size[2])
    assert item["agent_mask"].sum() == 3
    assert item["num_agent"] == 3
    # padded slots must be all-zero
    for a in range(MA):
        if not item["agent_mask"][a]:
            assert item["bev"][a].sum() == 0
            assert item["reg_mask"][a].sum() == 0
            assert item["label_one_hot"][a, ..., 1].sum() == 0


def test_dataset_rsu_switch(mini_root):
    with_rsu = V2XSimDet(mini_root, CFG, rsu=True, pack_bits=False)[0]
    no_rsu = V2XSimDet(mini_root, CFG, rsu=False, pack_bits=False)[0]
    assert no_rsu["agent_mask"].sum() == with_rsu["agent_mask"].sum() - 1
    # agent 1's data moves to slot 0 when the RSU is dropped
    np.testing.assert_array_equal(no_rsu["bev"][0], with_rsu["bev"][1])
    # trans realigned: slot 0's self-pose is identity
    np.testing.assert_allclose(no_rsu["trans"][0, 0], np.eye(4), atol=1e-5)


def test_dataset_upperbound(mini_root):
    ub = V2XSimDet(mini_root, CFG, rsu=True, bound="upperbound")[0]
    np.testing.assert_array_equal(ub["bev_packed"], ub["bev_teacher_packed"])


def test_dataset_packed_default_matches_dense(mini_root):
    """pack_bits=True (the default transport layout) must round-trip to the
    dense grids bit-for-bit (ops/bitpack.py)."""
    from disconet_tpu.ops.bitpack import unpack_bev_np

    dense = V2XSimDet(mini_root, CFG, rsu=True, pack_bits=False)[0]
    packed = V2XSimDet(mini_root, CFG, rsu=True)[0]
    z = CFG.grid_size[2]
    np.testing.assert_array_equal(
        unpack_bev_np(packed["bev_packed"], z, np.uint8), dense["bev"])
    np.testing.assert_array_equal(
        unpack_bev_np(packed["bev_teacher_packed"], z, np.uint8), dense["bev_teacher"])


def test_trans_matrices_consistency(mini_root):
    """T[i<-j] @ T[j<-i] must be identity for present agents."""
    item = V2XSimDet(mini_root, CFG, rsu=True)[0]
    n = int(item["agent_mask"].sum())
    # need T[j<-i]: load agent j's row i — the dataset stores per-receiver rows
    ds = V2XSimDet(mini_root, CFG, rsu=True)
    tr = item["trans"]
    for i in range(n):
        for j in range(n):
            prod = tr[i, j] @ np.linalg.inv(tr[i, j])
            np.testing.assert_allclose(prod, np.eye(4), atol=1e-4)
        np.testing.assert_allclose(tr[i, i], np.eye(4), atol=1e-5)


def test_batch_iterator(mini_root):
    ds = V2XSimDet(mini_root, CFG)
    it = BatchIterator(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(it)
    assert len(batches) == 1
    b = batches[0]
    assert b["bev_packed"].shape[0] == 2
    assert isinstance(b["gt_boxes"], list) and len(b["gt_boxes"]) == 2


def test_pose_noise_perturbation():
    """Pose noise leaves self-poses exact and perturbs cross poses (paper
    robustness study, utils/pose_noise.py)."""
    from disconet_tpu.utils.pose_noise import perturb_trans

    rng = np.random.default_rng(0)
    trans = np.tile(np.eye(4, dtype=np.float32), (2, 3, 3, 1, 1))
    out = perturb_trans(trans, std_t=0.5, std_r=0.1, rng=rng)
    for b in range(2):
        for i in range(3):
            np.testing.assert_array_equal(out[b, i, i], np.eye(4))
            for j in range(3):
                if i != j:
                    assert not np.allclose(out[b, i, j], np.eye(4))
    # still rigid: R^T R = I
    R = out[0, 0, 1][:2, :2]
    np.testing.assert_allclose(R.T @ R, np.eye(2), atol=1e-5)


class TestOcclusion:
    """LiDAR shadowing in the synthetic generator (data/synthetic.py
    shadow_segments / visible_fractions) — the collaboration signal of the
    quality benchmark: boxes fully shadowed for one agent must be visible to
    another, so single-view models structurally cannot match fusion models."""

    def test_visible_fraction_geometry(self):
        from disconet_tpu.data.synthetic import visible_fractions

        sensor = np.array([0.0, 0.0])
        boxes = np.array([
            [5.0, 0.0, 2.0, 4.0, 0.0],    # near, on the +x ray
            [15.0, 0.0, 2.0, 4.0, 0.0],   # directly behind the near one
            [5.0, 8.0, 2.0, 4.0, 0.0],    # off to the side, unshadowed
        ])
        f = visible_fractions(sensor, boxes)
        assert f[0] > 0.99
        assert f[1] < 0.2
        assert f[2] > 0.9

    def test_seam_wraparound(self):
        """Boxes straddling the ±π azimuth seam still shadow correctly."""
        from disconet_tpu.data.synthetic import visible_fractions

        sensor = np.array([0.0, 0.0])
        boxes = np.array([
            [-5.0, 0.001, 2.0, 4.0, 0.0],
            [-15.0, -0.001, 2.0, 4.0, 0.0],
        ])
        f = visible_fractions(sensor, boxes)
        assert f[0] > 0.9 and f[1] < 0.2

    def test_occluded_scene_hides_boxes_from_ego_not_neighbors(self):
        """Some in-range boxes return zero points to one agent while another
        agent sees them — the recoverable-only-via-fusion set is non-empty."""
        from disconet_tpu.config import tiny_config
        from disconet_tpu.data.synthetic import generate_scene

        cfg = tiny_config(64)  # the benchmark grid; 32 is too cramped to shadow
        (x_lo, x_hi), _, _ = cfg.area_extents
        max_range = 0.9 * (x_hi - x_lo)
        recoverable = 0
        for seed in range(8):
            sc = generate_scene(seed, cfg, num_agents=4, num_vehicles=16,
                                occlusion=True)
            A = sc["num_agents"]
            counts = np.zeros((A, len(sc["boxes_world"])), int)
            in_range = np.zeros_like(counts, bool)
            for a in range(A):
                sensor = sc["agent_poses"][a][:2, 3]
                pts = sc["points"][a]
                for g, b in enumerate(sc["boxes_world"]):
                    if np.hypot(b[0] - sensor[0], b[1] - sensor[1]) > max_range:
                        continue
                    in_range[a, g] = True
                    counts[a, g] = np.sum(
                        np.hypot(pts[:, 0] - b[0], pts[:, 1] - b[1]) < 3.0)
            hidden = in_range & (counts == 0)
            seen_by_any = (counts > 0).any(axis=0)
            recoverable += int((hidden & seen_by_any[None, :]).sum())
        assert recoverable > 0

    def test_no_occlusion_default_unchanged(self):
        """occlusion=False keeps the min-6-points floor: every in-range box
        returns points (the pre-occlusion generator contract)."""
        from disconet_tpu.data.synthetic import generate_scene

        (x_lo, x_hi), _, _ = CFG.area_extents
        max_range = 0.9 * (x_hi - x_lo)
        sc = generate_scene(3, CFG, num_agents=3, num_vehicles=10,
                            occlusion=False)
        for a in range(sc["num_agents"]):
            sensor = sc["agent_poses"][a][:2, 3]
            pts = sc["points"][a]
            for b in sc["boxes_world"]:
                if np.hypot(b[0] - sensor[0], b[1] - sensor[1]) > max_range:
                    continue
                assert np.sum(
                    np.hypot(pts[:, 0] - b[0], pts[:, 1] - b[1]) < 3.0) > 0

    def test_occlusion_flag_flows_through_dataset_frames(self, tmp_path):
        """generate_dataset(occlusion=True) writes loadable frames whose
        teacher BEV covers boxes the student BEV misses."""
        from disconet_tpu.data.synthetic import generate_dataset

        n_files, _ = generate_dataset(str(tmp_path), CFG, num_scenes=2,
                                      frames_per_scene=2, seed=5,
                                      num_agents=4, occlusion=True)
        assert n_files == 16
        ds = V2XSimDet(str(tmp_path), CFG)
        item = ds[0]
        # teacher (merged) occupancy strictly exceeds any single student view
        student = np.unpackbits(item["bev_packed"].view(np.uint8)).sum()
        teacher = np.unpackbits(item["bev_teacher_packed"].view(np.uint8)).sum()
        assert teacher > student


class TestMultiClass:
    """Multi-class det data path (VERDICT r2 #5): class-routed targets, the
    generator's size-separable classes, and the loader's sparse class ids."""

    def test_assign_targets_routes_class_columns(self):
        cfg = tiny_config(32, num_classes=4)
        gt = np.array([[1.0, 1.0, 2.0, 4.0, 0.3], [-2.0, -2.0, 2.4, 7.0, 1.0]])
        tgt = assign_targets(gt, cfg, gt_classes=np.array([2, 3]))
        lab = tgt["label_one_hot"].reshape(-1, 4)
        pos = tgt["reg_loss_mask"].reshape(-1)
        assert set(np.unique(np.argmax(lab[pos], -1))) <= {2, 3}
        # background rows untouched
        assert (lab[~pos, 0] == 1.0).all()

    def test_assign_targets_rejects_out_of_range_class(self):
        cfg = tiny_config(32, num_classes=3)
        gt = np.array([[1.0, 1.0, 2.0, 4.0, 0.3]])
        with pytest.raises(ValueError):
            assign_targets(gt, cfg, gt_classes=np.array([3]))  # >= num_classes

    def test_generator_emits_classes_and_loader_recovers_them(self, tmp_path):
        cfg = tiny_config(32, num_classes=4)
        generate_dataset(str(tmp_path), cfg, num_scenes=2, frames_per_scene=1,
                         seed=3, num_agents=2)
        ds = V2XSimDet(str(tmp_path), cfg, rsu=True, dense_targets=True)
        assert len(ds) == 2
        item = ds[0]
        assert "reg_pos_cls" in item and "gt_classes" in item
        MA = cfg.max_agents
        # dense label is (MA, H, W, num_anchors, C): flat anchor count is
        # the product of the three middle dims
        n_flat = int(np.prod(item["label_one_hot"].shape[1:4]))
        for a in range(MA):
            if not item["agent_mask"][a]:
                continue
            # sparse class ids == dense label argmax at the positive indices
            idx = item["reg_pos_idx"][a]
            live = idx < n_flat
            lab_flat = item["label_one_hot"][a].reshape(-1, cfg.num_classes)
            np.testing.assert_array_equal(
                item["reg_pos_cls"][a][live],
                np.argmax(lab_flat[idx[live]], axis=-1),
            )
            assert (item["reg_pos_cls"][a][live] >= 1).all()
            # host gt lists align
            assert len(item["gt_classes"][a]) == len(item["gt_boxes"][a])
        # multiple classes actually present in the data
        all_cls = np.concatenate([item["gt_classes"][a] for a in range(MA)])
        assert len(set(all_cls.tolist())) >= 2

    def test_binary_frames_default_to_class_one(self, mini_root):
        ds = V2XSimDet(mini_root, CFG, rsu=True)
        item = ds[0]
        assert "reg_pos_cls" not in item  # binary: sparse labels stay 2-col
        for a in range(CFG.max_agents):
            assert (item["gt_classes"][a] == 1).all()
            assert len(item["gt_classes"][a]) == len(item["gt_boxes"][a])

    def test_collate_and_pad_keep_gt_classes_ragged(self, mini_root):
        from disconet_tpu.data.dataset import pad_batch_to

        ds = V2XSimDet(mini_root, CFG, rsu=True)
        batch = collate_det([ds[0], ds[1]])
        assert isinstance(batch["gt_classes"], list) and len(batch["gt_classes"]) == 2
        pad_batch_to(batch, 4, CFG.max_agents)
        assert len(batch["gt_classes"]) == 4
        assert batch["gt_classes"][-1][0].shape == (0,)
