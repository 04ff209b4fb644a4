"""Map-scale voxel downsampling on host (dynamic output size).

Same averaging semantics as Open3D voxel_down_sample(_and_trace)
(reference dataset_utils.py:285-293, :534); deterministic ascending-key
output order. One sort + segment reduction; C++ fast path optional.
"""

from __future__ import annotations

import numpy as np


def voxel_downsample_np(points: np.ndarray, voxel_size: float,
                        min_bound: np.ndarray | None = None):
    """Returns (centroids [V,3], inverse [N] point->voxel row, counts [V])."""
    pts = np.asarray(points, np.float64)
    if min_bound is None:
        min_bound = pts.min(axis=0)
    ijk = np.floor((pts - min_bound) / voxel_size).astype(np.int64)
    dims = ijk.max(axis=0) - ijk.min(axis=0) + 1
    ijk -= ijk.min(axis=0)
    keys = (ijk[:, 0] * dims[1] + ijk[:, 1]) * dims[2] + ijk[:, 2]
    uniq, inverse, counts = np.unique(keys, return_inverse=True,
                                      return_counts=True)
    centroids = np.stack(
        [np.bincount(inverse, weights=pts[:, k], minlength=len(uniq))
         for k in range(3)], axis=1) / counts[:, None]
    return centroids, inverse, counts
