"""nuScenes odometry-style reader, devkit-free.

Equivalent surface to the reference nuScenesOdometryDataset
(pipeline/dataset/nuscenes_dataset.py:33-320, which wraps nuscenes-devkit):
walks one scene's LIDAR_TOP sample chain, composes sensor poses as
T_world_ego(t) @ T_ego_lidar (quaternion tables parsed directly from the
v1.0 JSON files), and serves scans, panoptic/lidarseg labels, camera frames
and TARL/DINO/SAM feature caches under the same folder contracts.
"""

from __future__ import annotations

import json
import os
import zlib
from dataclasses import dataclass

import numpy as np

from autoinst_tpu.datasets.base import (Dataset, DatasetConfig, DatasetEntry,
                                        cache_points)

TARL_DIM = 96


def quaternion_to_rotation(q) -> np.ndarray:
    """(w, x, y, z) unit quaternion -> 3x3 rotation matrix."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _pose_matrix(rotation_q, translation) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = quaternion_to_rotation(rotation_q)
    T[:3, 3] = translation
    return T


@dataclass
class NuScenesDatasetConfig(DatasetConfig):
    version: str = "v1.0-mini"


class NuScenesOdometryDataset(Dataset):
    def __init__(self, config: NuScenesDatasetConfig, seq_num: int = 0,
                 scene_name: str | None = None):
        self.config = config
        self.ds_path = config.dataset_path
        self.camera_names = ("CAM_FRONT", "CAM_FRONT_LEFT",
                             "CAM_FRONT_RIGHT")
        t = self._tables = {
            name: self._load_table(config.version, name)
            for name in ("scene", "sample", "sample_data", "ego_pose",
                         "calibrated_sensor", "sensor")
        }
        self._by_token = {
            name: {row["token"]: row for row in rows}
            for name, rows in t.items()
        }

        scenes = t["scene"]
        if scene_name is not None:
            seq_num = next(i for i, s in enumerate(scenes)
                           if s["name"] == scene_name)
        self.scene = scenes[seq_num]

        # chain samples, pick the LIDAR_TOP sample_data of each
        lidar_sds = []
        token = self.scene["first_sample_token"]
        sd_by_sample = {}
        for sd in t["sample_data"]:
            sensor = self._sensor_of(sd)
            if sensor["channel"] == "LIDAR_TOP" and sd["is_key_frame"]:
                sd_by_sample[sd["sample_token"]] = sd
        while token:
            sample = self._by_token["sample"][token]
            lidar_sds.append(sd_by_sample[sample["token"]])
            token = sample["next"]
        self._lidar_sds = lidar_sds
        self._poses = np.stack([self._sd_pose(sd) for sd in lidar_sds])

        out = os.path.join(self.ds_path, "outputs")
        self.tarl_features_path = os.path.join(out, "TARL")
        self.sam_label_path = os.path.join(out, config.sam_folder_name)
        self.dinov2_features_path = os.path.join(out,
                                                 config.dinov2_folder_name)

    def _load_table(self, version, name):
        with open(os.path.join(self.ds_path, version, name + ".json")) as fh:
            return json.load(fh)

    def _sensor_of(self, sd):
        cs = self._by_token["calibrated_sensor"][
            sd["calibrated_sensor_token"]]
        return self._by_token["sensor"][cs["sensor_token"]]

    def _sd_pose(self, sd) -> np.ndarray:
        ego = self._by_token["ego_pose"][sd["ego_pose_token"]]
        cs = self._by_token["calibrated_sensor"][
            sd["calibrated_sensor_token"]]
        T_w_ego = _pose_matrix(ego["rotation"], ego["translation"])
        T_ego_s = _pose_matrix(cs["rotation"], cs["translation"])
        return T_w_ego @ T_ego_s

    def __len__(self):
        return len(self._lidar_sds)

    def get_pose(self, index: int) -> np.ndarray:
        return self._poses[index]

    def _scan(self, index: int) -> np.ndarray:
        path = os.path.join(self.ds_path,
                            self._lidar_sds[index]["filename"])
        return np.fromfile(path, np.float32).reshape(-1, 5)

    @cache_points
    def get_point_cloud(self, index: int) -> np.ndarray:
        return self._scan(index)[:, :3]

    def get_intensity(self, index: int) -> np.ndarray:
        return self._scan(index)[:, 3]

    def _label_file(self, index: int, kind: str) -> np.ndarray:
        token = self._lidar_sds[index]["token"]
        path = os.path.join(self.ds_path, kind, self.config.version,
                            token + f"_{kind}.bin")
        if kind == "panoptic":
            # devkit stores panoptic as npz uint16: 1000*sem + inst
            path = os.path.join(self.ds_path, "panoptic",
                                self.config.version, token + "_panoptic.npz")
            return np.load(path)["data"].astype(np.int64)
        return np.fromfile(path, np.uint8).astype(np.int64)

    def get_semantic_labels(self, index: int) -> np.ndarray:
        try:
            pan = self._label_file(index, "panoptic")
            return (pan // 1000).reshape(-1, 1)
        except FileNotFoundError:
            return self._label_file(index, "lidarseg").reshape(-1, 1)

    def get_instance_labels(self, index: int) -> np.ndarray:
        pan = self._label_file(index, "panoptic")
        return (pan % 1000).reshape(-1, 1)

    def get_panoptic_labels(self, index: int) -> np.ndarray:
        pan = self._label_file(index, "panoptic")
        sem = pan // 1000
        inst = pan % 1000
        inst = np.where(inst == 0, sem, inst)
        return inst.reshape(-1, 1)

    def get_image(self, camera_name: str, index: int):
        sample = self._by_token["sample"][
            self._lidar_sds[index]["sample_token"]]
        for sd in self._tables["sample_data"]:
            if sd["sample_token"] != sample["token"] or not sd["is_key_frame"]:
                continue
            if self._sensor_of(sd)["channel"] == camera_name:
                from PIL import Image
                return Image.open(os.path.join(self.ds_path,
                                               sd["filename"]))
        return None

    def get_tarl_features(self, index: int) -> np.ndarray:
        token = self._lidar_sds[index]["token"]
        path = os.path.join(self.tarl_features_path, token + ".bin")
        with open(path, "rb") as fh:
            raw = zlib.decompress(fh.read())
        return np.frombuffer(raw, np.float32).reshape(-1, TARL_DIM)

    def __getitem__(self, index: int) -> DatasetEntry:
        entry = DatasetEntry(
            index, self.get_pose(index), self.get_point_cloud(index),
            self.get_intensity(index),
            self._safe_labels(index, self.get_panoptic_labels),
            self._safe_labels(index, self.get_semantic_labels),
            self._safe_labels(index, self.get_instance_labels), {})
        if self.config.filters:
            entry = self.config.filters(entry, self)
        return entry

    def _safe_labels(self, index, fn):
        try:
            return fn(index)
        except FileNotFoundError:
            return np.zeros((len(self.get_point_cloud(index)), 1), np.int64)
