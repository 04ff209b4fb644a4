"""Host statistical outlier removal (KD-tree), Open3D semantics.

The device path (ops/neighbors.statistical_inlier_mask) is a blocked
O(N^2) bruteforce -- the right shape for the TPU MXU, hopeless on a 1-core
host for the big aggregated GROUND chunks (hundreds of thousands of
points). This is the same computation the reference runs through Open3D's
KD-tree (point_cloud_utils.py:198-202): per-point mean distance to its
nb_neighbors nearest (self-inclusive), inlier iff below
mean + std_ratio * std (Bessel-corrected) over all points.
"""

from __future__ import annotations

import numpy as np


def statistical_inlier_mask_host(points: np.ndarray,
                                 nb_neighbors: int = 20,
                                 std_ratio: float = 2.0) -> np.ndarray:
    from scipy.spatial import cKDTree

    pts = np.asarray(points, np.float64)[:, :3]
    n = len(pts)
    if n == 0:
        return np.zeros(0, bool)
    k = min(nb_neighbors, n)
    d, _ = cKDTree(pts).query(pts, k=k, workers=-1)
    d = d.reshape(n, k)
    # self-inclusive mean over exactly nb_neighbors slots (missing
    # neighbors on tiny clouds contribute 0, matching the padded device
    # bruteforce semantics)
    avg = d.sum(axis=1) / nb_neighbors
    mean = avg.mean()
    std = avg.std(ddof=1) if n > 1 else 0.0
    return avg < mean + std_ratio * std
