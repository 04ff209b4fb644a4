"""KITTI odometry reader with self-contained calibration/pose parsing.

Replaces the reference's pykitti-backed KittiOdometryDataset
(pipeline/dataset/kitti_odometry_dataset.py:26-356) without the pykitti
dependency: calib.txt (P0..P3, Tr) and poses.txt are parsed directly, with
the same velodyne-frame pose construction

    T_w_velo = T_velo_cam0 @ T_w_cam0 @ T_cam0_velo      (reference :106-115)

and the same on-disk cache contracts for TARL (.bin, zlib f32 (N,96)),
DINOv2 (.npz[feature_map]) and SAM (.npz[masks]) features (:207-281).
"""

from __future__ import annotations

import os
import zlib
from dataclasses import dataclass

import numpy as np

from autoinst_tpu.datasets.base import (Dataset, DatasetConfig, DatasetEntry,
                                        cache_points)
from autoinst_tpu.datasets.filters import (FilterList,
                                           KittiGTMovingObjectFilter,
                                           RangeFilter)

TARL_DIM = 96
_HDL64_THETA = 0.205 * np.pi / 180.0


@dataclass
class KittiOdometryDatasetConfig(DatasetConfig):
    pass


def _read_calib(path: str) -> dict[str, np.ndarray]:
    out = {}
    with open(path) as fh:
        for line in fh:
            if ":" not in line:
                continue
            key, vals = line.split(":", 1)
            out[key.strip()] = np.fromstring(vals, sep=" ")
    return out


def _homogeneous(mat34: np.ndarray) -> np.ndarray:
    T = np.eye(4)
    T[:3, :4] = mat34.reshape(3, 4)
    return T


def correct_scan_calibration(xyz: np.ndarray) -> np.ndarray:
    """HDL-64 0.205deg per-point correction, Rodrigues vector form
    (same math as reference kitti_odometry_dataset.py:305-335)."""
    z_hat = np.array([0.0, 0.0, 1.0], dtype=np.float32)
    axes = np.cross(xyz, np.broadcast_to(z_hat, xyz.shape))
    axes = axes / np.linalg.norm(axes, axis=1, keepdims=True)
    c = np.float32(np.cos(_HDL64_THETA))
    s = np.float32(np.sin(_HDL64_THETA))
    k_cross = np.cross(axes, xyz)
    k_dot = np.sum(axes * xyz, axis=1, keepdims=True)
    return xyz * c + k_cross * s + axes * k_dot * (1.0 - c)


class KittiOdometryDataset(Dataset):
    def __init__(self, config: KittiOdometryDatasetConfig, seq_num: int):
        self.config = config
        self.seq_str = str(seq_num).zfill(2)
        self.ds_path = config.dataset_path
        self.sequence_path = os.path.join(self.ds_path, "sequences",
                                          self.seq_str)
        self.velodyne_path = os.path.join(self.sequence_path, "velodyne")
        self.labels_path = os.path.join(self.sequence_path, "labels")
        self.sam_label_path = os.path.join(self.ds_path,
                                           config.sam_folder_name,
                                           self.seq_str)
        self.dinov2_features_path = os.path.join(self.ds_path,
                                                 config.dinov2_folder_name,
                                                 self.seq_str)
        self.tarl_features_path = os.path.join(self.ds_path, "tarl_features",
                                               self.seq_str)
        self.camera_names = ("cam0", "cam1", "cam2", "cam3")
        self._calib = self._load_calib()
        self._poses = self._load_poses()

    # -- calibration / poses ------------------------------------------------

    def _load_calib(self):
        raw = _read_calib(os.path.join(self.sequence_path, "calib.txt"))
        calib = {"T_cam0_velo": _homogeneous(raw["Tr"])}
        for i in range(4):
            P = raw[f"P{i}"].reshape(3, 4)
            calib[f"K_cam{i}"] = P[:3, :3]
            # rectified cam i differs from cam0 by a baseline x-shift
            Ti = np.eye(4)
            Ti[0, 3] = P[0, 3] / P[0, 0]
            calib[f"T_cam{i}_velo"] = Ti @ calib["T_cam0_velo"]
        return calib

    def _load_poses(self):
        pose_file = os.path.join(self.ds_path, "poses",
                                 self.seq_str + ".txt")
        if not os.path.exists(pose_file):
            pose_file = os.path.join(self.sequence_path, "poses.txt")
        data = np.loadtxt(pose_file).reshape(-1, 3, 4)
        T_w_cam0 = np.pad(data, ((0, 0), (0, 1), (0, 0)))
        T_w_cam0[:, 3, 3] = 1.0
        t_cam_velo = self._calib["T_cam0_velo"]
        t_velo_cam = np.linalg.inv(t_cam_velo)
        return t_velo_cam @ T_w_cam0 @ t_cam_velo  # velodyne-frame poses

    def __len__(self):
        return len(self._poses)

    def get_pose(self, index: int) -> np.ndarray:
        return self._poses[index]

    def get_calibration_matrices(self, cam: str):
        return self._calib[f"T_{cam}_velo"], self._calib[f"K_{cam}"]

    # -- scans / labels ------------------------------------------------------

    def _read_velo(self, index: int) -> np.ndarray:
        path = os.path.join(self.velodyne_path, str(index).zfill(6) + ".bin")
        return np.fromfile(path, dtype=np.float32).reshape(-1, 4)

    @cache_points
    def get_point_cloud(self, index: int) -> np.ndarray:
        points = self._read_velo(index)[:, :3]
        if self.config.correct_scan_calibration:
            points = correct_scan_calibration(points)
        return points

    def get_intensity(self, index: int) -> np.ndarray:
        return self._read_velo(index)[:, 3]

    def _read_labels(self, index: int) -> np.ndarray:
        path = os.path.join(self.labels_path, str(index).zfill(6) + ".label")
        return np.fromfile(path, dtype=np.uint32)

    def get_semantic_labels(self, index: int) -> np.ndarray:
        return (self._read_labels(index) & 0xFFFF).reshape(-1, 1)

    def get_panoptic_labels(self, index: int) -> np.ndarray:
        """Instance field (upper 16 bits, kept shifted) with zeros backfilled
        by the semantic id (reference :73-86)."""
        raw = self._read_labels(index)
        semantic = (raw & 0xFFFF).reshape(-1, 1)
        instance = (raw & 0xFFFF0000).reshape(-1, 1)
        zero = instance == 0
        instance[zero] = semantic[zero]
        return instance

    def get_instance_labels(self, index: int) -> np.ndarray:
        """Reference :97-104 verbatim semantics, including its operator-
        precedence quirk: sem = raw & (0xFFFF + 10), result = instance * sem."""
        raw = self._read_labels(index)
        instance = (raw & 0xFFFF0000).reshape(-1, 1)
        sem = (raw & (0xFFFF + 10)).reshape(-1, 1)
        return instance * sem

    # -- images / cached features --------------------------------------------

    def get_image(self, camera_name: str, index: int):
        subdir = {"cam0": "image_0", "cam1": "image_1",
                  "cam2": "image_2", "cam3": "image_3"}[camera_name]
        path = os.path.join(self.sequence_path, subdir,
                            str(index).zfill(6) + ".png")
        if not os.path.exists(path):
            return None
        from PIL import Image
        return Image.open(path).convert("RGB")

    def get_sam_mask(self, camera_name: str, index: int):
        subdir = {"cam0": "image_0/masks", "cam1": "image_1/masks",
                  "cam2": "image_2", "cam3": "image_3"}[camera_name]
        path = os.path.join(self.sam_label_path, subdir,
                            str(index).zfill(6) + ".npz")
        return np.load(path, allow_pickle=True)["masks"]

    def get_dinov2_features(self, camera_name: str, index: int):
        subdir = {"cam0": "cam0", "cam1": "cam1",
                  "cam2": "image_2", "cam3": "image_3"}[camera_name]
        path = os.path.join(self.dinov2_features_path, subdir,
                            str(index).zfill(6) + ".npz")
        return np.load(path, allow_pickle=True)["feature_map"]

    def get_tarl_features(self, index: int) -> np.ndarray:
        path = os.path.join(self.tarl_features_path,
                            str(index).zfill(6) + ".bin")
        with open(path, "rb") as fh:
            raw = zlib.decompress(fh.read())
        return np.frombuffer(raw, dtype=np.float32).reshape(-1, TARL_DIM)

    def __getitem__(self, index: int) -> DatasetEntry:
        entry = DatasetEntry(
            index,
            self.get_pose(index),
            self.get_point_cloud(index),
            self.get_intensity(index),
            self.get_panoptic_labels(index),
            self.get_semantic_labels(index),
            self.get_instance_labels(index),
            {},
        )
        if self.config.filters:
            entry = self.config.filters(entry, self)
        return entry


def create_kitti_odometry_dataset(dataset_path: str, sequence_num: int,
                                  cache: bool = True,
                                  sam_folder_name: str = "sam_pred_underseg",
                                  dinov2_folder_name: str = "dinov2_features",
                                  correct_scan_calibration: bool = True,
                                  range_min: float = 3,
                                  range_max: float = 25,
                                  ncuts_mode: bool = True,
                                  with_mo_filter: bool = True):
    """Factory matching reference dataset_utils.py:74-142 (both variants:
    with_mo_filter=False gives the *_no_filter flavor)."""
    filters = None
    if ncuts_mode:
        chain = []
        if with_mo_filter:
            chain.append(KittiGTMovingObjectFilter(
                os.path.join(dataset_path, "sequences",
                             str(sequence_num).zfill(2), "labels")))
        chain.append(RangeFilter(range_min, range_max))
        filters = FilterList(chain)
    config = KittiOdometryDatasetConfig(
        dataset_path=dataset_path, cache=cache,
        sam_folder_name=sam_folder_name,
        dinov2_folder_name=dinov2_folder_name,
        correct_scan_calibration=correct_scan_calibration,
        filters=filters, dist_threshold=None,
    )
    return KittiOdometryDataset(config, sequence_num)
