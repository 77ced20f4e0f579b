"""NuscenesDataset / create_data_from_nuscenes (SURVEY.md C4/C5) against a
faked ``nuscenes-devkit``.

The real devkit is absent in this image (SURVEY.md §7), so these tests inject
a minimal in-memory implementation of the three interfaces the walker touches
(``NuScenes`` table access, ``LidarPointCloud.from_file``, the nuScenes
sample -> sample_data -> ego_pose/calibrated_sensor chain) and verify the
walker's geometry end-to-end: pose composition into ``trans_matrices``,
world->agent box transforms, own/teacher BEV content, and that the dumps load
through ``V2XSimDet`` unchanged.
"""

import os
import sys
import types

import numpy as np
import pytest

from disconet_tpu.config import tiny_config
from disconet_tpu.data import schema
from disconet_tpu.data.dataset import V2XSimDet
from disconet_tpu.ops.voxelize import voxelize_occupy_np

CFG = tiny_config(32)  # extents +-4 m, voxel 0.25


def _yaw_quat(yaw):  # nuScenes [w, x, y, z]
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def _pose(yaw, t):
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4)
    T[:2, :2] = [[c, -s], [s, c]]
    T[:3, 3] = t
    return T


# scene geometry shared by fixture and assertions
T_WS = {0: _pose(0.0, (0.0, 0.0, 0.0)), 1: _pose(np.pi / 2, (2.0, 1.0, 0.0))}
VEH_WORLD = dict(xy=(1.5, 0.5), w=0.5, l=1.0, yaw=0.3)
N_FRAMES = 2


@pytest.fixture
def fake_devkit(tmp_path, monkeypatch):
    """Install a fake ``nuscenes`` package and build a 1-scene, 2-frame,
    2-agent release under tmp_path. Returns the dataroot."""
    rng = np.random.default_rng(0)
    tables = {"sample": {}, "sample_data": {}, "calibrated_sensor": {},
              "ego_pose": {}, "sample_annotation": {}}

    def add_pose(table, token, T):
        yaw = float(np.arctan2(T[1, 0], T[0, 0]))
        tables[table][token] = {"rotation": _yaw_quat(yaw), "translation": list(T[:3, 3])}

    samples = []
    os.makedirs(os.path.join(tmp_path, "sweeps"), exist_ok=True)
    for f in range(N_FRAMES):
        tok = f"samp{f}"
        data, anns = {}, []
        for a, T in T_WS.items():
            # cal = identity, ego = full pose (walker composes ego @ cal)
            add_pose("ego_pose", f"ego{a}_{f}", T)
            add_pose("calibrated_sensor", f"cal{a}", np.eye(4))
            pts = rng.uniform(-3.0, 3.0, size=(4, 50)).astype(np.float32)
            pts[3] = 2.0  # per-point semantic label channel: class 2 (road)
            rel = f"sweeps/a{a}_f{f}.npy"
            np.save(os.path.join(tmp_path, rel), pts)
            # one prev (non-keyframe) sweep at a shifted ego pose, so
            # sweeps=2 exercises the prev-chain aggregation
            T_prev = T.copy()
            T_prev[0, 3] += 0.5
            add_pose("ego_pose", f"egoprev{a}_{f}", T_prev)
            prev_pts = rng.uniform(-2.0, 2.0, size=(4, 30)).astype(np.float32)
            prev_pts[3] = 2.0
            prev_rel = f"sweeps/a{a}_f{f}_prev.npy"
            np.save(os.path.join(tmp_path, prev_rel), prev_pts)
            tables["sample_data"][f"sw{a}_{f}"] = {
                "filename": prev_rel, "calibrated_sensor_token": f"cal{a}",
                "ego_pose_token": f"egoprev{a}_{f}", "prev": "",
            }
            sd_tok = f"sd{a}_{f}"
            tables["sample_data"][sd_tok] = {
                "filename": rel, "calibrated_sensor_token": f"cal{a}",
                "ego_pose_token": f"ego{a}_{f}", "prev": f"sw{a}_{f}",
            }
            data[f"LIDAR_TOP_id_{a}"] = sd_tok
        tables["sample_annotation"][f"veh{f}"] = {
            "category_name": "vehicle.car", "rotation": _yaw_quat(VEH_WORLD["yaw"]),
            # real nuScenes schema: size = [width, length, height] with
            # *length* along the heading. VEH_WORLD["w"] is the framework's
            # along-heading slot-2 extent, so it goes in size[1]; an
            # asymmetric w != l here catches a walker that swaps them.
            "size": [VEH_WORLD["l"], VEH_WORLD["w"], 1.5],
            "translation": [*VEH_WORLD["xy"], 0.0],
        }
        tables["sample_annotation"][f"ped{f}"] = {
            "category_name": "human.pedestrian.adult", "rotation": _yaw_quat(0.0),
            "size": [0.5, 0.5, 1.8], "translation": [0.5, -0.5, 0.0],
        }
        anns = [f"veh{f}", f"ped{f}"]
        tables["sample"][tok] = {"data": data, "anns": anns,
                                 "next": f"samp{f + 1}" if f + 1 < N_FRAMES else ""}
        samples.append(tok)

    class FakeNuScenes:
        def __init__(self, version, dataroot, verbose=False):
            assert version and os.path.isdir(dataroot)
            self.dataroot = dataroot
            self.scene = [{"first_sample_token": samples[0]}]

        def get(self, table, token):
            return tables[table][token]

    class LidarPointCloud:
        def __init__(self, points):
            self.points = points  # (4, N), devkit layout

        @classmethod
        def from_file(cls, path):
            return cls(np.load(path))

    pkg = types.ModuleType("nuscenes")
    mod = types.ModuleType("nuscenes.nuscenes")
    utils = types.ModuleType("nuscenes.utils")
    dc = types.ModuleType("nuscenes.utils.data_classes")
    mod.NuScenes = FakeNuScenes
    dc.LidarPointCloud = LidarPointCloud
    pkg.nuscenes, pkg.utils, utils.data_classes = mod, utils, dc
    for name, m in [("nuscenes", pkg), ("nuscenes.nuscenes", mod),
                    ("nuscenes.utils", utils), ("nuscenes.utils.data_classes", dc)]:
        monkeypatch.setitem(sys.modules, name, m)
    return str(tmp_path)


def _dump(fake_devkit, tmp_path):
    from disconet_tpu.data.nuscenes_walker import create_data_from_nuscenes

    out = str(tmp_path / "parsed")
    n = create_data_from_nuscenes(fake_devkit, out, CFG, version="v2.0-mini")
    return out, n


def test_walker_dumps_all_agent_frames(fake_devkit, tmp_path):
    out, n = _dump(fake_devkit, tmp_path)
    assert n == len(T_WS) * N_FRAMES
    for a in T_WS:
        for f in range(N_FRAMES):
            assert os.path.isfile(os.path.join(schema.frame_dir(out, a, 0, f), "0.npy"))


def test_walker_pose_composition(fake_devkit, tmp_path):
    out, _ = _dump(fake_devkit, tmp_path)
    for i in T_WS:
        fr = schema.load_frame(os.path.join(schema.frame_dir(out, i, 0, 0), "0.npy"))
        assert int(fr["num_agent"]) == 2 and int(fr["target_agent_id"]) == i
        trans = fr["trans_matrices"]
        assert trans.shape == (CFG.max_agents, 4, 4)
        np.testing.assert_allclose(trans[i], np.eye(4), atol=1e-6)
        for j in T_WS:
            expect = np.linalg.inv(T_WS[i]) @ T_WS[j]  # T[this <- j]
            np.testing.assert_allclose(trans[j], expect, atol=1e-6)


def test_walker_bev_and_teacher_content(fake_devkit, tmp_path):
    out, _ = _dump(fake_devkit, tmp_path)
    fr = schema.load_frame(os.path.join(schema.frame_dir(out, 0, 0, 1), "0.npy"))
    pts = np.load(os.path.join(fake_devkit, "sweeps/a0_f1.npy"))[:3].T
    own = voxelize_occupy_np(pts, CFG.voxel_size, CFG.area_extents)
    np.testing.assert_array_equal(fr["padded_voxel_points"][0].astype(bool), own.astype(bool))
    # teacher (holistic) BEV is a superset of the agent's own occupancy and
    # contains agent 1's points too (they land in-range after the pose warp)
    teacher = fr["padded_voxel_points_teacher"][0].astype(bool)
    assert np.all(teacher[own.astype(bool)])
    assert teacher.sum() > own.astype(bool).sum()


def test_walker_box_transform_and_class_filter(fake_devkit, tmp_path):
    out, _ = _dump(fake_devkit, tmp_path)
    # agent 0 sits at the world origin: its gt box IS the world vehicle box,
    # and the pedestrian annotation is filtered out
    fr0 = schema.load_frame(os.path.join(schema.frame_dir(out, 0, 0, 0), "0.npy"))
    assert fr0["gt_boxes"].shape == (1, 5)
    np.testing.assert_allclose(
        fr0["gt_boxes"][0],
        [*VEH_WORLD["xy"], VEH_WORLD["w"], VEH_WORLD["l"], VEH_WORLD["yaw"]],
        atol=1e-5,
    )
    # agent 1: box center mapped through inv(T_ws1), yaw reduced by agent yaw
    fr1 = schema.load_frame(os.path.join(schema.frame_dir(out, 1, 0, 0), "0.npy"))
    assert fr1["gt_boxes"].shape == (1, 5)
    p = np.linalg.inv(T_WS[1]) @ np.array([*VEH_WORLD["xy"], 0.0, 1.0])
    np.testing.assert_allclose(fr1["gt_boxes"][0, :2], p[:2], atol=1e-5)
    np.testing.assert_allclose(fr1["gt_boxes"][0, 4], VEH_WORLD["yaw"] - np.pi / 2, atol=1e-5)


def test_walker_output_loads_through_dataset(fake_devkit, tmp_path):
    out, _ = _dump(fake_devkit, tmp_path)
    ds = V2XSimDet(out, CFG, rsu=True)
    assert len(ds) == N_FRAMES
    item = ds[0]
    H, W, Z = CFG.grid_size
    assert item["bev_packed"].shape == (CFG.max_agents, H, W, (Z + 7) // 8)
    assert item["trans"].shape == (CFG.max_agents, CFG.max_agents, 4, 4)
    assert item["agent_mask"].sum() == 2


def test_walker_sweep_aggregation(fake_devkit, tmp_path):
    """sweeps=2 follows the prev chain and maps the prev sweep through its own
    ego pose into the keyframe sensor frame (SURVEY.md §4.4 'LiDAR sweep(s)')."""
    from disconet_tpu.data.nuscenes_walker import create_data_from_nuscenes

    out = str(tmp_path / "parsed_sw")
    create_data_from_nuscenes(fake_devkit, out, CFG, version="v2.0-mini", sweeps=2)
    fr = schema.load_frame(os.path.join(schema.frame_dir(out, 0, 0, 0), "0.npy"))
    key_pts = np.load(os.path.join(fake_devkit, "sweeps/a0_f0.npy"))[:3].T
    prev_pts = np.load(os.path.join(fake_devkit, "sweeps/a0_f0_prev.npy"))[:3].T
    T_prev = T_WS[0].copy()
    T_prev[0, 3] += 0.5
    T_key_prev = np.linalg.inv(T_WS[0]) @ T_prev
    prev_in_key = (T_key_prev @ np.c_[prev_pts, np.ones(len(prev_pts))].T).T[:, :3]
    expect = voxelize_occupy_np(
        np.concatenate([key_pts, prev_in_key]).astype(np.float32),
        CFG.voxel_size, CFG.area_extents,
    )
    np.testing.assert_array_equal(
        fr["padded_voxel_points"][0].astype(bool), expect.astype(bool)
    )
    # and strictly more occupancy than single-sweep
    single = voxelize_occupy_np(key_pts.astype(np.float32), CFG.voxel_size, CFG.area_extents)
    assert expect.astype(bool).sum() > single.astype(bool).sum()


def test_det_category_map_is_prefix_explicit():
    from disconet_tpu.data.nuscenes_walker import is_det_category

    assert is_det_category("vehicle.car")
    assert is_det_category("vehicle.truck.fire")  # prefix match
    assert is_det_category("vehicle.bicycle")
    assert not is_det_category("human.pedestrian.adult")
    assert not is_det_category("static_object.bicycle_rack")
    # a custom map narrows the foreground set explicitly
    assert not is_det_category("vehicle.bicycle", categories=("vehicle.car",))


def _load_cli(name, rel):
    import importlib.util

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    spec = importlib.util.spec_from_file_location(name, os.path.join(repo, rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_det_cli_nuscenes_mode_trains_end_to_end(fake_devkit, tmp_path):
    """VERDICT r1 #1: the CLI (not the library) drives --mode nuscenes, and the
    produced frames train end-to-end."""
    import jax

    from disconet_tpu.models import build_model
    from disconet_tpu.training import batch_to_device, create_train_state, make_train_step

    cli = _load_cli("create_data_det_cli", "tools/det/create_data_det.py")
    root = str(tmp_path / "parsed_cli")
    cli.main(["--mode", "nuscenes", "--root", fake_devkit, "--data", root,
              "--split", "train", "--grid", "32"])
    data_dir = os.path.join(root, "train")
    ds = V2XSimDet(data_dir, CFG, rsu=True, dense_targets=False)
    assert len(ds) == N_FRAMES

    from disconet_tpu.data import BatchIterator

    loader = BatchIterator(ds, batch_size=2, shuffle=False, num_workers=1)
    batch = next(iter(loader))
    model = build_model("disco", CFG)
    state = create_train_state(model, CFG, jax.random.PRNGKey(0), batch, lr=1e-3)
    step = make_train_step(model, CFG)
    state, m = step(state, batch_to_device(batch), None)
    assert np.isfinite(float(m["loss"]))


def test_seg_cli_nuscenes_mode_trains_end_to_end(fake_devkit, tmp_path):
    import jax

    from disconet_tpu.data import BatchIterator
    from disconet_tpu.data.dataset import V2XSimSeg
    from disconet_tpu.models import build_model
    from disconet_tpu.training import batch_to_device, create_train_state
    from disconet_tpu.training.seg_module import make_seg_train_step

    cli = _load_cli("create_data_seg_cli", "tools/seg/create_data_seg.py")
    root = str(tmp_path / "parsed_seg_cli")
    cli.main(["--mode", "nuscenes", "--root", fake_devkit, "--data", root,
              "--split", "train", "--grid", "32"])
    data_dir = os.path.join(root, "train")
    ds = V2XSimSeg(data_dir, CFG, rsu=True)
    assert len(ds) == N_FRAMES
    item = ds[0]
    # fixture points all carry label 2 (road): every occupied non-vehicle cell
    # that got points must be road; vehicle box cells are class 1
    lab = item["seg_label"][item["agent_mask"].argmax()]
    assert set(np.unique(lab)) <= {0, 1, 2}
    assert (lab == 2).sum() > 0 and (lab == 1).sum() > 0

    loader = BatchIterator(ds, batch_size=2, shuffle=False, num_workers=1)
    batch = next(iter(loader))
    model = build_model("disco", CFG, task="seg")
    state = create_train_state(model, CFG, jax.random.PRNGKey(0), batch, lr=1e-3)
    step = make_seg_train_step(model, CFG)
    state, m = step(state, batch_to_device(batch))
    assert np.isfinite(float(m["loss"]))
