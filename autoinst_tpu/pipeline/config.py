"""Pipeline configuration, preserving the reference's public knob surface.

The reference is a module of constants star-imported everywhere
(pipeline/config.py:1-91). Here the same names live on a PipelineConfig
dataclass (testable, overridable), and the module also exposes the constants
at import time for drop-in familiarity. Weight configs carry the exact
reference names/values (config.py:6-48).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, replace

import numpy as np

from autoinst_tpu.datasets.semantic_kitti import LEARNING_MAP as learning_map

config_tarl_spatial_dino = {
    "name": "spatial_1.0_tarl_0.5_dino_0.1_t_0.005",
    "out_folder": "ncuts_data_tarl_dino_spatial/",
    "gamma": 0.1, "alpha": 1.0, "theta": 0.5, "beta": 0.0,
    "T": 0.005, "gt": True,
}

config_tarl_spatial = {
    "name": "spatial_1.0_tarl_0.5_t_0.03",
    "out_folder": "ncuts_data_tarl_spatial/",
    "gamma": 0.0, "alpha": 1.0, "theta": 0.5, "beta": 0.0,
    "T": 0.03, "gt": True,
}

config_spatial = {
    "name": "spatial_1.0_t_0.075",
    "out_folder": "ncuts_data_spatial/",
    "gamma": 0.0, "alpha": 1.0, "theta": 0.0, "beta": 0.0,
    "T": 0.075, "gt": True,
}

config_maskpls_tarl_spatial = {
    "name": "maskpls_tarl_spatial_",
    "out_folder": "maskpls_tarl_spatial/",
    "gamma": 0.0, "alpha": 0.0, "theta": 0.0, "beta": 0.0,
    "T": 0.0, "gt": True,
}


@dataclass
class PipelineConfig:
    dataset_path: str = os.environ.get("AUTOINST_DATASET_PATH",
                                       "/data/semantic_kitti/")
    config: dict = field(default_factory=lambda: dict(config_tarl_spatial))

    start_chunk: int = 0
    start_seq: int = 0
    seqs: tuple = tuple(range(0, 11))
    exclude: tuple = (1, 4)  # static-only scenes

    minor_voxel_size: float = 0.05
    major_voxel_size: float = 0.35
    chunk_size: np.ndarray = field(
        default_factory=lambda: np.array([25, 25, 25]))
    overlap: float = 3
    ground_segmentation_method: str = "patchwork"
    ncut_ground: bool = False
    split_lim: float = 0.01

    beta: float = 0.0
    tarl_norm: bool = False
    proximity_threshold: float = 1.0
    hpr_radius: float = 1000
    num_dino_features: int = 384
    mean_height: float = 0.6

    adjacent_frames_cam: tuple = (16, 13)
    adjacent_frames_tarl: tuple = (10, 10)
    cam_ids: tuple = (0,)
    metrics_threads: int = 1
    metrics_min_points: int = 200

    gen_self_train_data: bool = False
    test_map: bool = True  # stop after the first sample map
    maskpls_weights: str = os.environ.get("AUTOINST_MASKPLS_WEIGHTS", "")
    maskpls_kwargs: dict = field(default_factory=dict)  # RefinerModel args
    dataset_type: str = "kitti"      # kitti | nuscenes | pandaset

    out_folder: str = "pcd_preprocessed/instances/"
    map_scans: int = 1000       # scans per map (divide_indices chunk_size)
    min_map_scans: int = 200    # skip smaller trailing maps

    # TPU execution knobs (no reference counterpart)
    batched_chunks: bool = False     # all chunks of a map in one dispatch
    ncut_method: str = "auto"        # eigh | lobpcg | auto (host worklist)
    ncut_backend: str = "auto"       # device | host | auto (device on TPU)
    affinity_tile: int = 256
    use_pallas: bool | None = None   # None = auto (TPU yes, CPU no)
    # evaluation-only: renumber predicted ids by first occurrence before
    # metrics so the label-ascending greedy/AP tie-breaks are invariant to
    # arbitrary label numbering (parity harness sets it on BOTH sides)
    canonical_label_order: bool = False

    def __post_init__(self):
        if self.gen_self_train_data:
            self.overlap = 24        # reference config.py:76-77
            self.test_map = False    # reference config.py:85-86

    @property
    def out_folder_ncuts(self) -> str:
        return self.out_folder + self.config["out_folder"]

    @property
    def out_folder_instances(self) -> str:
        return self.out_folder + "instances/"

    @property
    def out_folder_train(self) -> str:
        return self.out_folder + "train/"

    def with_config(self, weight_config: dict) -> "PipelineConfig":
        return replace(self, config=dict(weight_config))


# module-level constants mirroring the reference surface (config.py:50-91)
_default = PipelineConfig()
DATASET_PATH = _default.dataset_path
start_chunk = _default.start_chunk
start_seq = _default.start_seq
seqs = list(_default.seqs)
exclude = list(_default.exclude)
MINOR_VOXEL_SIZE = _default.minor_voxel_size
MAJOR_VOXEL_SIZE = _default.major_voxel_size
CHUNK_SIZE = _default.chunk_size
OVERLAP = _default.overlap
ground_segmentation_method = _default.ground_segmentation_method
NCUT_ground = _default.ncut_ground
SPLIT_LIM = _default.split_lim
BETA = _default.beta
TARL_NORM = _default.tarl_norm
PROXIMITY_THRESHOLD = _default.proximity_threshold
HPR_RADIUS = _default.hpr_radius
NUM_DINO_FEATURES = _default.num_dino_features
MEAN_HEIGHT = _default.mean_height
ADJACENT_FRAMES_CAM = _default.adjacent_frames_cam
ADJACENT_FRAMES_TARL = _default.adjacent_frames_tarl
CAM_IDS = list(_default.cam_ids)
METRICS_THREADS = _default.metrics_threads
GEN_SELF_TRAIN_DATA = _default.gen_self_train_data
TEST_MAP = _default.test_map
MASKPLS_weights = _default.maskpls_weights
CONFIG = config_tarl_spatial
OUT_FOLDER = _default.out_folder
OUT_FOLDER_NCUTS = OUT_FOLDER + CONFIG["out_folder"]
OUT_FOLDER_INSTANCES = OUT_FOLDER + "instances/"
OUT_FOLDER_TRAIN = OUT_FOLDER + "train/"
