"""Alternative aggregation-based clustering (the reference's non-default
path, pipeline/utils/aggregate.py:29-352): aggregate a window of scans,
split ground, then cluster non-ground points with DBSCAN or curved-voxel
clustering (CVC) instead of normalized cuts.

DBSCAN uses sklearn when present, else a self-contained grid implementation;
CVC (the reference's external pycluster C++ binding) is reimplemented as
union-find connected components over a curved (polar) voxel hash.
"""

from __future__ import annotations

import numpy as np

from autoinst_tpu.pipeline.aggregation import ground_split_indices


def dbscan_cluster(points: np.ndarray, eps: float = 0.5,
                   min_samples: int = 10) -> np.ndarray:
    """DBSCAN labels (-1 = noise)."""
    try:
        from sklearn.cluster import DBSCAN
        return DBSCAN(eps=eps, min_samples=min_samples).fit(
            np.asarray(points)).labels_
    except ImportError:
        return _grid_dbscan(np.asarray(points), eps, min_samples)


def _grid_dbscan(points: np.ndarray, eps: float, min_samples: int
                 ) -> np.ndarray:
    """Exact DBSCAN via grid-bucketed region queries (no sklearn)."""
    n = len(points)
    cell = eps
    ijk = np.floor((points - points.min(0)) / cell).astype(np.int64)
    dims = ijk.max(0) + 1
    keys = (ijk[:, 0] * dims[1] + ijk[:, 1]) * dims[2] + ijk[:, 2]
    order = np.argsort(keys)
    skeys = keys[order]

    def neighbors(i):
        out = []
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                for dk in (-1, 0, 1):
                    c = ijk[i] + (di, dj, dk)
                    if np.any(c < 0) or np.any(c >= dims):
                        continue
                    key = (c[0] * dims[1] + c[1]) * dims[2] + c[2]
                    lo = np.searchsorted(skeys, key)
                    hi = np.searchsorted(skeys, key, side="right")
                    cand = order[lo:hi]
                    d = np.linalg.norm(points[cand] - points[i], axis=1)
                    out.append(cand[d <= eps])
        return np.concatenate(out) if out else np.zeros(0, np.int64)

    labels = np.full(n, -2, np.int64)  # -2 unvisited
    cluster = -1
    for i in range(n):
        if labels[i] != -2:
            continue
        nb = neighbors(i)
        if len(nb) < min_samples:
            labels[i] = -1
            continue
        cluster += 1
        labels[i] = cluster
        seeds = list(nb)
        while seeds:
            j = seeds.pop()
            if labels[j] == -1:
                labels[j] = cluster
            if labels[j] != -2:
                continue
            labels[j] = cluster
            nb_j = neighbors(j)
            if len(nb_j) >= min_samples:
                seeds.extend(nb_j)
    return labels


def curved_voxel_cluster(points: np.ndarray, delta_rho: float = 0.35,
                         delta_phi_deg: float = 1.2,
                         delta_theta_deg: float = 1.2) -> np.ndarray:
    """Curved-Voxel Clustering: polar voxelization + 26-connected
    components (replacement for the reference's pycluster C++ binding,
    aggregate.py:17,275-280)."""
    pts = np.asarray(points)
    rho = np.linalg.norm(pts[:, :2], axis=1)
    phi = np.degrees(np.arctan2(pts[:, 1], pts[:, 0]))
    theta = np.degrees(np.arctan2(pts[:, 2], np.maximum(rho, 1e-9)))
    ijk = np.stack([
        np.floor(rho / delta_rho),
        np.floor((phi + 180.0) / delta_phi_deg),
        np.floor((theta + 90.0) / delta_theta_deg),
    ], axis=1).astype(np.int64)
    uniq, inverse = np.unique(ijk, axis=0, return_inverse=True)

    # union-find over occupied voxels
    parent = np.arange(len(uniq))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    dims = uniq.max(0) + 2
    keymap = {}
    for vi, c in enumerate(uniq):
        keymap[(c[0] * dims[1] + c[1]) * dims[2] + c[2]] = vi
    offsets = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
               for k in (-1, 0, 1) if (i, j, k) != (0, 0, 0)]
    for vi, c in enumerate(uniq):
        for off in offsets:
            q = c + off
            key = (q[0] * dims[1] + q[1]) * dims[2] + q[2]
            vj = keymap.get(key)
            if vj is not None:
                ra, rb = find(vi), find(vj)
                if ra != rb:
                    parent[rb] = ra
    roots = np.array([find(v) for v in range(len(uniq))])
    _, comp = np.unique(roots, return_inverse=True)
    return comp[inverse]


class AggregationClustering:
    """Aggregate a window of scans + cluster non-ground points
    (reference aggregate.py:29-352, default DBSCAN flavor)."""

    def __init__(self, method: str = "dbscan", eps: float = 0.5,
                 min_samples: int = 10):
        self.method = method
        self.eps = eps
        self.min_samples = min_samples

    def cluster_window(self, dataset, ind_start: int, ind_end: int):
        """Returns (points_world [N,3], labels [N]; ground = -1)."""
        pts_all, ground_flags = [], []
        for i in range(ind_start, ind_end):
            entry = dataset[i]
            pose = dataset.get_pose(i)
            g_idcs, ng_idcs = ground_split_indices(entry.point_cloud)
            world = entry.point_cloud[:, :3] @ pose[:3, :3].T + pose[:3, 3]
            flags = np.zeros(len(world), bool)
            flags[g_idcs] = True
            pts_all.append(world)
            ground_flags.append(flags)
        pts = np.concatenate(pts_all)
        is_ground = np.concatenate(ground_flags)

        labels = np.full(len(pts), -1, np.int64)
        nonground = np.where(~is_ground)[0]
        if len(nonground):
            if self.method == "dbscan":
                lab = dbscan_cluster(pts[nonground], self.eps,
                                     self.min_samples)
            else:
                lab = curved_voxel_cluster(pts[nonground])
            labels[nonground] = lab
        return pts, labels
