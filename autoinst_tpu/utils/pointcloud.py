"""A minimal struct-of-arrays point-cloud container (Open3D replacement).

The reference passes o3d.geometry.PointCloud everywhere; this container
carries the same state (points + colors as numpy arrays) with the handful of
operations the pipeline needs. Device code never sees this class -- it is a
host-side bookkeeping type; compute goes through autoinst_tpu.ops.
"""

from __future__ import annotations

import numpy as np


class PointCloud:
    __slots__ = ("points", "colors")

    def __init__(self, points: np.ndarray | None = None,
                 colors: np.ndarray | None = None):
        self.points = (np.zeros((0, 3), np.float64) if points is None
                       else np.asarray(points, np.float64).reshape(-1, 3))
        if colors is None:
            self.colors = np.zeros((0, 3), np.float64)
        else:
            self.colors = np.asarray(colors, np.float64).reshape(-1, 3)

    def __len__(self):
        return len(self.points)

    def has_colors(self) -> bool:
        return len(self.colors) == len(self.points) and len(self.points) > 0

    def copy(self) -> "PointCloud":
        return PointCloud(self.points.copy(), self.colors.copy())

    def paint_uniform_color(self, rgb) -> "PointCloud":
        self.colors = np.tile(np.asarray(rgb, np.float64), (len(self.points), 1))
        return self

    def select_by_index(self, indices) -> "PointCloud":
        indices = np.asarray(indices)
        colors = self.colors[indices] if self.has_colors() else None
        return PointCloud(self.points[indices], colors)

    def transform(self, T: np.ndarray) -> "PointCloud":
        self.points = self.points @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
        return self

    def crop_aabb(self, min_bound, max_bound, strict=False):
        """Indices of points inside the box (closed bounds, like Open3D crop)."""
        p = self.points
        if strict:
            m = np.all(p > min_bound, axis=1) & np.all(p < max_bound, axis=1)
        else:
            m = np.all(p >= min_bound, axis=1) & np.all(p <= max_bound, axis=1)
        return np.where(m)[0]

    def __add__(self, other: "PointCloud") -> "PointCloud":
        pts = np.concatenate([self.points, other.points])
        if self.has_colors() or other.has_colors():
            c1 = self.colors if self.has_colors() else np.zeros_like(self.points)
            c2 = other.colors if other.has_colors() else np.zeros_like(other.points)
            colors = np.concatenate([c1, c2])
        else:
            colors = None
        return PointCloud(pts, colors)

    def remove_duplicated_points(self) -> "PointCloud":
        """Keep the first occurrence of each exact coordinate triple
        (Open3D RemoveDuplicatedPoints semantics)."""
        _, first = np.unique(self.points, axis=0, return_index=True)
        keep = np.sort(first)
        # evaluate BEFORE reassigning points: once points shrink,
        # has_colors() compares old colors against new points and colors
        # would never be filtered (r2 bug: merged-map colors misaligned
        # from points whenever chunks overlapped)
        with_colors = self.has_colors()
        self.points = self.points[keep]
        if with_colors:
            self.colors = self.colors[keep]
        return self

    def get_min_bound(self):
        return self.points.min(axis=0)

    def get_max_bound(self):
        return self.points.max(axis=0)
