"""Composable per-scan filters (reference: pipeline/dataset/filters/).

Same chain semantics: each filter maps DatasetEntry -> DatasetEntry; the
moving-object filter must run first (it indexes the raw scan's labels).
"""

from __future__ import annotations

import glob
import os

import numpy as np

from autoinst_tpu.datasets.base import Dataset, DatasetEntry
from autoinst_tpu.datasets.semantic_kitti import MOVING_LABEL_START


class Filter:
    def __call__(self, entry: DatasetEntry, dataset: Dataset | None = None
                 ) -> DatasetEntry:
        raise NotImplementedError


class FilterList(Filter):
    def __init__(self, filters):
        self.filters = list(filters)

    def __call__(self, entry, dataset=None):
        for f in self.filters:
            entry = f(entry, dataset=dataset)
        return entry


def _mask_entry(entry: DatasetEntry, mask: np.ndarray) -> DatasetEntry:
    return DatasetEntry(
        entry.index, entry.pose,
        entry.point_cloud[mask], entry.intensity[mask],
        entry.panoptic_labels[mask], entry.semantic_labels[mask],
        entry.instance_labels[mask], entry.images,
    )


class KittiGTMovingObjectFilter(Filter):
    """Drop points whose GT semantic label is a moving-* class
    (reference filters/kitti_gt_mo_filter.py:15-61: keeps labels < 251)."""

    def __init__(self, label_path: str):
        self.labels = sorted(glob.glob(os.path.join(label_path, "*.label")))

    def __call__(self, entry, dataset=None):
        raw = np.fromfile(self.labels[entry.index], dtype=np.uint32)
        semantic = raw & 0xFFFF
        return _mask_entry(entry, semantic < MOVING_LABEL_START)


class RangeFilter(Filter):
    """Keep points with min_range <= |p| <= max_range
    (reference filters/range_filter.py:10-36)."""

    def __init__(self, min_range: float, max_range: float, is_centered=True):
        self.min_range = min_range
        self.max_range = max_range
        self.is_centered = is_centered

    def __call__(self, entry, dataset=None):
        pts = entry.point_cloud[:, :3]
        if not self.is_centered:
            pts = pts - entry.pose[:3, 3][None, :]
        norm = np.linalg.norm(pts, axis=1)
        return _mask_entry(entry, (norm >= self.min_range)
                           & (norm <= self.max_range))


class ApplyPose(Filter):
    """Transform the scan into (or out of) the pose frame
    (reference filters/apply_pose.py:9-28)."""

    def __init__(self, invert=False):
        self.invert = invert

    def __call__(self, entry, dataset=None):
        T = np.linalg.inv(entry.pose) if self.invert else entry.pose
        pts = entry.point_cloud[:, :3] @ T[:3, :3].T + T[:3, 3]
        return DatasetEntry(entry.index, entry.pose, pts, entry.intensity,
                            entry.panoptic_labels, entry.semantic_labels,
                            entry.instance_labels, entry.images)
