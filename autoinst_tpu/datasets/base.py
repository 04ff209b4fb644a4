"""Dataset abstraction: entries, protocol, scan cache.

Equivalent surface to the reference's abstract Dataset / DatasetEntry
(pipeline/dataset/dataset.py:11-50, dataset_entry.py:9-21) with a plain
dataclass config instead of the nptyping-annotated original.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from functools import wraps
from typing import Any

import numpy as np


@dataclass
class DatasetEntry:
    index: int
    pose: np.ndarray                 # (4, 4) velodyne-frame pose
    point_cloud: np.ndarray          # (N, 3)
    intensity: np.ndarray            # (N,)
    panoptic_labels: np.ndarray      # (N, 1)
    semantic_labels: np.ndarray      # (N, 1)
    instance_labels: np.ndarray      # (N, 1)
    images: dict[str, Any] = field(default_factory=dict)


@dataclass
class DatasetConfig:
    dataset_path: str
    cache: bool = True
    sam_folder_name: str = "sam_pred_underseg"
    dinov2_folder_name: str = "dinov2_features"
    filters: Any = None
    dist_threshold: float | None = None
    correct_scan_calibration: bool = True


class Dataset(ABC):
    config: DatasetConfig

    @abstractmethod
    def __len__(self) -> int: ...

    @abstractmethod
    def get_pose(self, index: int) -> np.ndarray: ...

    @abstractmethod
    def get_point_cloud(self, index: int) -> np.ndarray: ...

    @abstractmethod
    def __getitem__(self, index: int) -> DatasetEntry: ...


def cache_points(func):
    """Memoize per-scan point clouds when config.cache is set
    (reference dataset.py:33-50)."""

    @wraps(func)
    def wrapper(self, index: int):
        if not hasattr(self, "_points_cache"):
            self._points_cache = {}
        if self.config.cache and index in self._points_cache:
            return self._points_cache[index]
        points = func(self, index)
        if self.config.cache:
            self._points_cache[index] = points
        return points

    return wrapper
