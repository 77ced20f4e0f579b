"""V2X-Sim (nuScenes-format) walker (SURVEY.md C4/C5, reference
coperception/datasets/NuscenesDataset.py + tools/det/create_data_det.py).

V2X-Sim 2.0 ships as a nuScenes-format release where each scene carries the
LiDAR sweeps of up to 6 agents (agent 0 = RSU) as separate sensor channels
(``LIDAR_TOP_id_{i}``). This module walks those tables and emits the exact
per-agent frame dicts of ``schema.py`` — the same output create_data_det.py
produces from the synthetic generator, so downstream code is identical.

Requires ``nuscenes-devkit``, which is NOT installed in the build image
(SURVEY.md §7 environment note) — every entry point import-gates it with a
clear error. The logic is written against the public nuScenes schema
(sample -> sample_data -> ego_pose / calibrated_sensor) and the documented
V2X-Sim channel naming; verify channel names against a real release before a
production run (tier-[B] reconstruction, SURVEY.md §0).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from disconet_tpu.config import Config
from disconet_tpu.data import schema
from disconet_tpu.data.targets import assign_targets
from disconet_tpu.ops.boxes import make_anchors
from disconet_tpu.ops.voxelize import voxelize_occupy_np


def _require_devkit():
    try:
        from nuscenes.nuscenes import NuScenes  # noqa: F401

        return NuScenes
    except ImportError as e:  # pragma: no cover - devkit absent in this image
        raise ImportError(
            "nuscenes-devkit is required to walk a real V2X-Sim release "
            "(pip install nuscenes-devkit). For offline development use the "
            "synthetic generator (tools/det/create_data_det.py --mode synthetic)."
        ) from e


def _quat_to_rot(q: List[float]) -> np.ndarray:
    """nuScenes [w, x, y, z] quaternion -> 3x3 rotation matrix."""
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float64,
    )


def _pose_to_matrix(pose: Dict) -> np.ndarray:
    T = np.eye(4, dtype=np.float64)
    T[:3, :3] = _quat_to_rot(pose["rotation"])
    T[:3, 3] = np.asarray(pose["translation"], dtype=np.float64)
    return T


class NuscenesDataset:
    """Thin wrapper over the nuScenes tables of a V2X-Sim release (C4).

    Iterates (scene_idx, frame_idx) and exposes per-agent LiDAR points (sensor
    frame), global sensor poses, and global-frame gt boxes.
    """

    LIDAR_CHANNEL = "LIDAR_TOP_id_{agent}"

    def __init__(self, dataroot: str, version: str = "v2.0-mini", max_agents: int = 6):
        NuScenes = _require_devkit()
        self.nusc = NuScenes(version=version, dataroot=dataroot, verbose=False)
        self.max_agents = max_agents

    def frames(self) -> Iterator[Tuple[int, int, Dict]]:
        from nuscenes.utils.data_classes import LidarPointCloud

        for s_idx, scene in enumerate(self.nusc.scene):
            token = scene["first_sample_token"]
            f_idx = 0
            while token:
                sample = self.nusc.get("sample", token)
                agents = {}
                for a in range(self.max_agents):
                    chan = self.LIDAR_CHANNEL.format(agent=a)
                    if chan not in sample["data"]:
                        continue
                    sd = self.nusc.get("sample_data", sample["data"][chan])
                    pc = LidarPointCloud.from_file(
                        os.path.join(self.nusc.dataroot, sd["filename"])
                    )
                    cal = self.nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
                    ego = self.nusc.get("ego_pose", sd["ego_pose_token"])
                    # sensor -> global: T_global_ego @ T_ego_sensor
                    T_ws = _pose_to_matrix(ego) @ _pose_to_matrix(cal)
                    agents[a] = {"points": pc.points[:3].T, "T_ws": T_ws}
                boxes = []
                for ann_token in sample["anns"]:
                    ann = self.nusc.get("sample_annotation", ann_token)
                    if "vehicle" not in ann["category_name"]:
                        continue
                    yaw = _yaw_from_quat(ann["rotation"])
                    w, l = ann["size"][0], ann["size"][1]
                    boxes.append([*ann["translation"][:2], w, l, yaw])
                yield s_idx, f_idx, {
                    "agents": agents,
                    "boxes_world": np.asarray(boxes, dtype=np.float32).reshape(-1, 5),
                }
                token = sample["next"]
                f_idx += 1


def _yaw_from_quat(q: List[float]) -> float:
    w, x, y, z = q
    return float(np.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z)))


def create_data_from_nuscenes(
    dataroot: str,
    savepath: str,
    config: Config,
    version: str = "v2.0-mini",
    scenes: Optional[List[int]] = None,
) -> int:
    """Walk a V2X-Sim release and dump per-agent frame dicts (C5 semantics).

    For each frame: per-agent BEV from its own sensor-frame cloud, holistic
    teacher BEV from all agents' clouds merged into that agent's frame, anchor
    targets from global boxes transformed into the agent frame, and the
    (max_agents, 4, 4) ``trans_matrices`` with T[this <- j].
    """
    ds = NuscenesDataset(dataroot, version=version, max_agents=config.max_agents)
    anchors = make_anchors(config)
    (x_lo, x_hi), (y_lo, y_hi), _ = config.area_extents
    n_files = 0

    for s_idx, f_idx, fr in ds.frames():
        if scenes is not None and s_idx not in scenes:
            continue
        agents = fr["agents"]
        merged_world = np.concatenate(
            [
                (a["T_ws"] @ np.c_[a["points"], np.ones(len(a["points"]))].T).T[:, :3]
                for a in agents.values()
            ]
        )
        for i, ai in agents.items():
            T_iw = np.linalg.inv(ai["T_ws"])

            def to_agent(pts_w):
                return (T_iw @ np.c_[pts_w, np.ones(len(pts_w))].T).T[:, :3]

            bev = voxelize_occupy_np(ai["points"], config.voxel_size, config.area_extents)
            bev_teacher = voxelize_occupy_np(
                to_agent(merged_world), config.voxel_size, config.area_extents
            )
            # global boxes -> agent frame
            boxes = fr["boxes_world"].copy()
            if len(boxes):
                yaw_i = np.arctan2(ai["T_ws"][1, 0], ai["T_ws"][0, 0])
                homo = np.c_[boxes[:, :2], np.zeros(len(boxes)), np.ones(len(boxes))]
                pa = (T_iw @ homo.T).T
                boxes[:, :2] = pa[:, :2]
                boxes[:, 4] -= yaw_i
                inside = (
                    (boxes[:, 0] >= x_lo) & (boxes[:, 0] < x_hi)
                    & (boxes[:, 1] >= y_lo) & (boxes[:, 1] < y_hi)
                )
                boxes = boxes[inside]
            tgt = assign_targets(boxes, config, anchors=anchors)
            trans = np.tile(np.eye(4, dtype=np.float32), (config.max_agents, 1, 1))
            for j, aj in agents.items():
                trans[j] = (T_iw @ aj["T_ws"]).astype(np.float32)
            schema.save_frame(
                savepath, i, s_idx, f_idx,
                {
                    "padded_voxel_points": bev[None].astype(np.float32),
                    "padded_voxel_points_teacher": bev_teacher[None].astype(np.float32),
                    "label_one_hot": tgt["label_one_hot"],
                    "reg_target": tgt["reg_target"],
                    "reg_loss_mask": tgt["reg_loss_mask"],
                    "anchors_map": tgt["anchors_map"],
                    "vis_maps": bev.max(axis=-1).astype(np.float32),
                    "gt_max_iou": tgt["gt_max_iou"],
                    "gt_boxes": boxes.astype(np.float32),
                    "target_agent_id": np.int32(i),
                    "num_agent": np.int32(len(agents)),
                    "trans_matrices": trans,
                },
                # real V2X-Sim dumps are the parity data source: keep dense
                # fp32 targets exactly as the reference writes them (the lossy
                # f16/binary-label compression exists only for the synthetic
                # test fixtures, schema.py)
                compress=False,
            )
            n_files += 1
    return n_files
