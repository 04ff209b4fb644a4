"""Pandaset reader (pandas pickle layout, devkit-free).

Equivalent surface to the reference PandasetDataset
(pipeline/dataset/pandaset_dataset.py:22-..., which wraps the pandaset
devkit): per-frame lidar pickles are pandas DataFrames with world-frame
x/y/z/i columns; poses come from lidar/poses.json (quaternion + position).
A cuboid-based moving-object filter mirrors the reference
PandasetGTMovingObjectFilter (filters/pandaset_gt_mo_filter.py:10-52).
"""

from __future__ import annotations

import gzip
import json
import os
import pickle
from dataclasses import dataclass

import numpy as np

from autoinst_tpu.datasets.base import (Dataset, DatasetConfig, DatasetEntry,
                                        cache_points)
from autoinst_tpu.datasets.nuscenes import quaternion_to_rotation


@dataclass
class PandasetDatasetConfig(DatasetConfig):
    pass


def _load_pickle(path):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as fh:
        return pickle.load(fh)


class PandasetDataset(Dataset):
    def __init__(self, config: PandasetDatasetConfig, seq_num: int):
        self.config = config
        self.seq_str = str(seq_num).zfill(3)
        self.seq_path = os.path.join(config.dataset_path, self.seq_str)
        lidar_dir = os.path.join(self.seq_path, "lidar")
        self._frames = sorted(
            f for f in os.listdir(lidar_dir)
            if f.endswith(".pkl") or f.endswith(".pkl.gz"))
        self._lidar_dir = lidar_dir
        with open(os.path.join(lidar_dir, "poses.json")) as fh:
            poses = json.load(fh)
        self._poses = np.stack([self._pose_matrix(p) for p in poses])
        self.camera_names = ("front_camera",)

    @staticmethod
    def _pose_matrix(p) -> np.ndarray:
        q = (p["heading"]["w"], p["heading"]["x"], p["heading"]["y"],
             p["heading"]["z"])
        T = np.eye(4)
        T[:3, :3] = quaternion_to_rotation(q)
        T[:3, 3] = [p["position"]["x"], p["position"]["y"],
                    p["position"]["z"]]
        return T

    def __len__(self):
        return len(self._frames)

    def get_pose(self, index: int) -> np.ndarray:
        return self._poses[index]

    def _frame(self, index: int):
        return _load_pickle(os.path.join(self._lidar_dir,
                                         self._frames[index]))

    @cache_points
    def get_point_cloud(self, index: int) -> np.ndarray:
        """Pandaset lidar points are stored in WORLD frame; return them in
        the sensor frame for pipeline consistency (pose^-1 applied)."""
        df = self._frame(index)
        world = np.stack([df["x"], df["y"], df["z"]], axis=1)
        Tinv = np.linalg.inv(self.get_pose(index))
        return world @ Tinv[:3, :3].T + Tinv[:3, 3]

    def get_intensity(self, index: int) -> np.ndarray:
        return np.asarray(self._frame(index)["i"], np.float64)

    def get_semantic_labels(self, index: int) -> np.ndarray:
        path = os.path.join(self.seq_path, "annotations", "semseg",
                            self._frames[index])
        if not os.path.exists(path):
            return np.zeros((len(self.get_point_cloud(index)), 1), np.int64)
        return np.asarray(_load_pickle(path)["class"],
                          np.int64).reshape(-1, 1)

    def get_instance_labels(self, index: int) -> np.ndarray:
        return np.zeros((len(self.get_point_cloud(index)), 1), np.int64)

    def get_panoptic_labels(self, index: int) -> np.ndarray:
        return self.get_semantic_labels(index)

    def get_image(self, camera_name: str, index: int):
        path = os.path.join(self.seq_path, "camera", camera_name,
                            f"{index:02d}.jpg")
        if not os.path.exists(path):
            return None
        from PIL import Image
        return Image.open(path)

    def get_cuboids(self, index: int):
        path = os.path.join(self.seq_path, "annotations", "cuboids",
                            self._frames[index])
        return _load_pickle(path) if os.path.exists(path) else None

    def __getitem__(self, index: int) -> DatasetEntry:
        entry = DatasetEntry(
            index, self.get_pose(index), self.get_point_cloud(index),
            self.get_intensity(index), self.get_panoptic_labels(index),
            self.get_semantic_labels(index),
            self.get_instance_labels(index), {})
        if self.config.filters:
            entry = self.config.filters(entry, self)
        return entry


def points_in_oriented_box(points, center, dims, yaw) -> np.ndarray:
    """Mask of points inside a yaw-oriented box (used by the moving-object
    filter; replaces the reference's Delaunay hull test)."""
    c, s = np.cos(-yaw), np.sin(-yaw)
    local = points[:, :3] - np.asarray(center)
    x = local[:, 0] * c - local[:, 1] * s
    y = local[:, 0] * s + local[:, 1] * c
    half = np.asarray(dims) / 2.0
    return (np.abs(x) <= half[0]) & (np.abs(y) <= half[1]) \
        & (np.abs(local[:, 2]) <= half[2])


class PandasetGTMovingObjectFilter:
    """Drop points inside non-stationary cuboids
    (reference filters/pandaset_gt_mo_filter.py:10-52)."""

    def __init__(self, dataset: PandasetDataset):
        self.dataset = dataset

    def __call__(self, entry: DatasetEntry, dataset=None) -> DatasetEntry:
        cuboids = self.dataset.get_cuboids(entry.index)
        if cuboids is None:
            return entry
        keep = np.ones(len(entry.point_cloud), bool)
        moving = cuboids[~cuboids["stationary"].astype(bool)] \
            if "stationary" in cuboids else cuboids
        for _, row in moving.iterrows():
            inside = points_in_oriented_box(
                entry.point_cloud,
                (row["position.x"], row["position.y"], row["position.z"]),
                (row["dimensions.x"], row["dimensions.y"],
                 row["dimensions.z"]),
                row["yaw"])
            keep &= ~inside
        from autoinst_tpu.datasets.filters import _mask_entry
        return _mask_entry(entry, keep)
