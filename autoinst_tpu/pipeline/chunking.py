"""Trajectory chunking + pose subsampling + TARL feature reprojection.

Equivalents of pipeline/utils/point_cloud/chunk_generation.py, with the
per-point Open3D KD-tree loops replaced by device ops:
  * statistical outlier removal per chunk -> ops.neighbors (tiled kNN);
  * TARL radius mean-pooling -> ops.neighbors.radius_mean_pool (masked GEMM).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from autoinst_tpu.hostops import grid_nn1
from autoinst_tpu.ops.neighbors import radius_mean_pool, statistical_inlier_mask
from autoinst_tpu.utils.pointcloud import PointCloud

_BUCKET = 4096


def _pad_to_bucket(points: np.ndarray, bucket: int = _BUCKET):
    n = len(points)
    m = max(((n + bucket - 1) // bucket) * bucket, bucket)
    out = np.zeros((m, 3), np.float32)
    out[:n] = points[:, :3]
    valid = np.zeros(m, bool)
    valid[:n] = True
    return out, valid


def statistical_inlier_indices(points: np.ndarray, nb_neighbors: int = 20,
                               std_ratio: float = 2.0) -> np.ndarray:
    """Indices of statistical inliers (reference point_cloud_utils.py:198-202)."""
    if len(points) == 0:
        return np.zeros(0, np.int64)
    if jax.default_backend() != "tpu":
        # KD-tree host path: the blocked O(N^2) bruteforce is MXU-shaped
        # but takes tens of minutes per aggregated ground chunk on a
        # 1-core host (hundreds of thousands of points)
        from autoinst_tpu.hostops.outliers import statistical_inlier_mask_host
        mask = statistical_inlier_mask_host(
            np.asarray(points), nb_neighbors=nb_neighbors,
            std_ratio=std_ratio)
        return np.where(mask)[0]
    padded, valid = _pad_to_bucket(points)
    mask = np.asarray(statistical_inlier_mask(
        jnp.asarray(padded), jnp.asarray(valid),
        nb_neighbors=nb_neighbors, std_ratio=std_ratio))[:len(points)]
    return np.where(mask)[0]


def subsample_positions(positions: np.ndarray, voxel_size: float = 1.0
                        ) -> np.ndarray:
    """Sparse pose subsampling, reference semantics (chunk_generation.py:17-45):
    keep pose p iff some grid node g (axis-aligned lattice anchored at the
    position minimum, pitch voxel_size) has p as its nearest pose with
    |g - p| < 0.5 voxel per axis.

    The reference scans every lattice node against every pose (O(G*P) cdist
    batches); here only the <=8 lattice nodes surrounding each pose are
    checked via exact grid 1-NN, which is the same set condition.
    """
    positions = np.asarray(positions, np.float64)
    mins = positions.min(axis=0)

    # candidate lattice nodes: for each pose, the surrounding lattice corners
    rel = (positions - mins) / voxel_size
    corners = []
    for dx in (np.floor, np.ceil):
        for dy in (np.floor, np.ceil):
            for dz in (np.floor, np.ceil):
                corners.append(np.stack([dx(rel[:, 0]), dy(rel[:, 1]),
                                         dz(rel[:, 2])], axis=1))
    cand = np.unique(np.concatenate(corners), axis=0)
    nodes = cand * voxel_size + mins

    idx, _ = grid_nn1(nodes, positions, cell=voxel_size)
    keep = set()
    for node, i in zip(nodes, idx):
        if np.all(np.abs(node - positions[i]) < 0.5 * voxel_size):
            keep.add(int(i))
    return np.sort(np.array(sorted(keep), dtype=np.int64))


def chunks_from_pointcloud(pcd: PointCloud, T_pcd: np.ndarray,
                           positions: np.ndarray, first_position: np.ndarray,
                           indices, chunk_size: np.ndarray, overlap: float,
                           labels: dict | None = None, ground: bool = False):
    """Cut the map into overlapping chunks along the trajectory
    (reference chunk_generation.py:96-180). Returns the same 7-tuple."""
    points = pcd.points

    pcd_chunks, chunk_indices, center_pos, center_ids, chunk_bounds, obbs = \
        [], [], [], [], [], []
    kitti_out = {"panoptic": [], "semantic": [], "instance": []} \
        if labels is not None else None

    distance = 0.0
    last_position = None
    rot = np.linalg.inv(T_pcd[:3, :3])
    for position, index in zip(positions, indices):
        if last_position is not None:
            distance += np.linalg.norm(position - last_position)
            if distance > (min(chunk_size[0], chunk_size[1]) - overlap):
                pos_pcd = rot @ (position - first_position)
                max_position = pos_pcd + 0.5 * chunk_size
                min_position = pos_pcd - 0.5 * chunk_size

                ids = np.where(np.all(points > min_position, axis=1)
                               & np.all(points < max_position, axis=1))[0]
                obbs.append(0)
                cut = pcd.select_by_index(ids)
                inlier = statistical_inlier_indices(cut.points)
                final = cut.select_by_index(inlier)

                if labels is not None:
                    sem_key = "seg_ground" if ground else "seg_nonground"
                    inst_key = ("instance_ground" if ground
                                else "instance_nonground")
                    kitti_out["semantic"].append(labels[sem_key][ids][inlier])
                    kitti_out["instance"].append(labels[inst_key][ids][inlier])

                pcd_chunks.append(final)
                chunk_indices.append(ids)
                center_pos.append(pos_pcd)
                center_ids.append(index)
                chunk_bounds.append((pos_pcd - 0.5 * chunk_size,
                                     pos_pcd + 0.5 * chunk_size))
                distance = 0.0
        last_position = position

    return (pcd_chunks, chunk_indices, center_pos, center_ids, chunk_bounds,
            kitti_out, obbs)


def indices_per_patch(T_pcd: np.ndarray, center_positions, positions,
                      first_position, global_indices, chunk_size) -> list:
    """Scan ids whose pose lies within half a chunk of each chunk center
    (reference chunk_generation.py:183-202)."""
    rot = np.linalg.inv(T_pcd[:3, :3])
    out = []
    for center in center_positions:
        ids = []
        for position, index in zip(positions, global_indices):
            pos_pcd = rot @ (position - first_position)
            if np.linalg.norm(center - pos_pcd) < 0.5 * chunk_size[1]:
                ids.append(index)
        out.append(ids)
    return out


def get_indices_feature_reprojection(global_indices: list, first_id: int,
                                     adjacent_frames=(8, 5)):
    """Adjacent scan ids around first_id (reference chunk_generation.py:261-271)."""
    first_index = global_indices.index(first_id)
    cam_indices = global_indices[max(0, first_index - adjacent_frames[0]):
                                 first_index + adjacent_frames[1]]
    local = [global_indices.index(g) for g in cam_indices]
    return cam_indices, local


def tarl_features_per_patch(dataset, pcd: PointCloud, T_pcd: np.ndarray,
                            center_position: np.ndarray, tarl_indices,
                            chunk_size: np.ndarray, search_radius: float,
                            norm: bool = False) -> np.ndarray:
    """Mean-pool cached TARL features of adjacent scans onto chunk points
    (reference chunk_generation.py:205-258). The per-point KD-tree radius
    loop becomes one masked GEMM on device."""
    max_position = center_position + 0.5 * chunk_size
    min_position = center_position - 0.5 * chunk_size
    T_inv = np.linalg.inv(T_pcd)

    coords_acc, feats_acc = [], []
    for points_index in tarl_indices:
        feats = dataset.get_tarl_features(points_index)
        coords = dataset.get_point_cloud(points_index)
        T_local2global = T_inv @ dataset.get_pose(points_index)
        coords = coords[:, :3] @ T_local2global[:3, :3].T + T_local2global[:3, 3]
        mask = np.where(np.all(coords > min_position, axis=1)
                        & np.all(coords < max_position, axis=1))[0]
        coords_acc.append(coords[mask])
        feats_acc.append(feats[mask])

    coords_acc = np.concatenate(coords_acc) if coords_acc else np.zeros((0, 3))
    feats_acc = np.concatenate(feats_acc) if feats_acc else np.zeros((0, 96))
    n = len(pcd.points)
    if len(coords_acc) == 0:
        return np.zeros((n, 96), np.float64)

    refs, ref_valid = _pad_to_bucket(coords_acc, 2048)
    feats_pad = np.zeros((len(refs), feats_acc.shape[1]), np.float32)
    feats_pad[:len(feats_acc)] = feats_acc
    queries, _ = _pad_to_bucket(pcd.points, 512)
    pooled, counts = radius_mean_pool(jnp.asarray(queries), jnp.asarray(refs),
                                      jnp.asarray(feats_pad), search_radius,
                                      ref_valid=jnp.asarray(ref_valid))
    pooled = np.asarray(pooled[:n], np.float64)
    if norm:
        norms = np.linalg.norm(pooled, axis=1, keepdims=True)
        nz = norms[:, 0] > 0
        pooled[nz] = pooled[nz] / norms[nz]
    return pooled
