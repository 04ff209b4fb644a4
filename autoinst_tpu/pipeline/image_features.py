"""Camera-feature back-projection: HPR visibility + projection + SAM/DINO.

Equivalent of the reference image pipeline
(pipeline/utils/image/image_utils.py:91-380, point_to_pixels.py:6-36,
hidden_points_removal.py:6-25): for adjacent camera frames, compute visible
chunk points (spherical-flip hidden point removal), project them through the
camera intrinsics, and gather per-point SAM instance ids (N, V) and DINOv2
patch features (N, V, 384), then view-average DINO features.

Host/device split: HPR convex hulls and image gathers stay on host (qhull +
irregular indexing); the visibility 1-NN filter runs on device.
"""

from __future__ import annotations

import numpy as np

from autoinst_tpu.ops.neighbors import nn1_bruteforce
from autoinst_tpu.utils.pointcloud import PointCloud

CAM_NAMES = ["cam2", "cam3"]


def point_to_pixel_arrays(points_cam: np.ndarray, K: np.ndarray,
                          img_height: int, img_width: int):
    """Perspective projection with rounding + in-image + in-front filtering
    (reference point_to_pixels.py:6-36). Returns (indices, pixels [M,2] xy,
    depth [M])."""
    proj = K @ points_cam.T
    with np.errstate(divide="ignore", invalid="ignore"):
        proj[:2] = np.round(proj[:2] / proj[2])
    ok = ((proj[0] < img_width) & (proj[0] >= 0)
          & (proj[1] < img_height) & (proj[1] >= 0) & (proj[2] > 0))
    idx = np.where(ok)[0]
    return idx, proj[:2, idx].T.astype(int), proj[2, idx]


def hidden_point_removal(points: np.ndarray, camera, radius_factor=100.0):
    """Katz et al. spherical-flip HPR (Open3D semantics,
    hidden_points_removal.py:6-25): flip points about a sphere centered at
    the camera, take the convex hull of flipped points + camera; hull
    vertices are the visible points."""
    from scipy.spatial import ConvexHull
    pts = points - np.asarray(camera, np.float64)
    diameter = np.linalg.norm(points.max(axis=0) - points.min(axis=0))
    radius = diameter * radius_factor
    norm = np.linalg.norm(pts, axis=1, keepdims=True)
    norm = np.maximum(norm, 1e-12)
    flipped = pts + 2 * (radius - norm) * pts / norm
    hull = ConvexHull(np.vstack([flipped, np.zeros(3)]))
    visible = hull.vertices
    return visible[visible < len(points)]


def reduce_feature_map(feature_map: np.ndarray, n_out: int) -> np.ndarray:
    """Per-image reduction of an (H, W, C) feature map to n_out channels.

    The reference's NUM_DINO_FEATURES < 384 path fits a fresh per-image
    UMAP (image_utils.py:236-250, non-default; the shipped config uses
    384 = no reduction). UMAP is a stochastic CPU C-extension with no
    sensible TPU mapping, so this deviates: a per-image PCA projection
    (top n_out principal components of the (H*W, C) token cloud), which
    is deterministic, jit-friendly, and preserves the knob's purpose of
    shrinking the DINO distance computation. Documented in docs/PARITY.md.
    """
    import jax.numpy as jnp
    h, w, c = feature_map.shape
    flat = jnp.asarray(feature_map.reshape(h * w, c), jnp.float32)
    centered = flat - flat.mean(axis=0)
    # right singular vectors of the token cloud = principal axes
    _, _, vt = jnp.linalg.svd(centered, full_matrices=False)
    out = centered @ vt[:n_out].T
    return np.asarray(out).reshape(h, w, n_out)


def masks_to_image(masks) -> np.ndarray:
    """SAM mask dicts -> pixel-wise instance-id map, 1-based
    (reference image_utils.py:42-50)."""
    image_labels = np.zeros(masks[0]["segmentation"].shape)
    for i, mask in enumerate(masks):
        image_labels[mask["segmentation"]] = i + 1
    return image_labels


def dinov2_mean(point2dino: np.ndarray) -> np.ndarray:
    """Mean of per-view DINO features over views that saw the point
    (reference image_utils.py:363-371), vectorized."""
    seen = point2dino.any(axis=2)                      # [N, V]
    cnt = seen.sum(axis=1)                             # [N]
    summed = (point2dino * seen[:, :, None]).sum(axis=1)
    out = np.zeros((point2dino.shape[0], point2dino.shape[2]))
    nz = cnt > 0
    out[nz] = summed[nz] / cnt[nz, None]
    return out


def image_based_features_per_patch(dataset, pcd_minor: PointCloud,
                                   chunk_indices, chunk_nc: PointCloud,
                                   T_pcd2world: np.ndarray, cam_indices,
                                   cfg, sam=True, dino=True):
    """Per-camera (point2sam [N,V], point2dino [N,V,F]) for the chunk's
    major-downsampled points (reference image_utils.py:91-360)."""
    from autoinst_tpu.pipeline.chunking import statistical_inlier_indices
    import jax.numpy as jnp

    num_points_nc = len(chunk_nc)
    pcd_chunk = pcd_minor.select_by_index(chunk_indices)
    inlier = statistical_inlier_indices(pcd_chunk.points)
    chunk_and_inlier_indices = np.asarray(chunk_indices)[inlier]

    point2sam_list, point2dino_list = [], []

    for cam_id in cfg.cam_ids:
        cam = CAM_NAMES[cam_id]
        image = dataset.get_image(cam, 0)
        if image is None:
            continue
        w, h = image.size

        if sam:
            point2sam_nc = -np.ones((num_points_nc, len(cam_indices)), int)
        if dino:
            point2dino_nc = np.zeros((num_points_nc, len(cam_indices),
                                      cfg.num_dino_features))

        pts_chunk = pcd_chunk.points
        min_bound = pts_chunk.min(axis=0)
        max_bound = pts_chunk.max(axis=0)
        minor_world = pcd_minor.points  # map frame == world (T_pcd = eye)

        for i, points_index in enumerate(cam_indices):
            T_world2lidar = np.linalg.inv(dataset.get_pose(points_index))
            T_lidar2cam, K = dataset.get_calibration_matrices(cam)
            T_pcd2cam = T_lidar2cam @ T_world2lidar @ T_pcd2world

            camframe = minor_world @ T_pcd2cam[:3, :3].T + T_pcd2cam[:3, 3]
            # restrict HPR to the chunk AABB (reference :168-180 speedup)
            bound_idx = np.where(
                np.all(minor_world > min_bound, axis=1)
                & np.all(minor_world < max_bound, axis=1))[0]
            if len(bound_idx) < 4:
                continue
            try:
                vis = hidden_point_removal(camframe[bound_idx], [0, 0, 0],
                                           radius_factor=cfg.hpr_radius)
            except Exception:
                continue  # "hpr skip" (reference :183-191)
            visible_indices = bound_idx[vis]

            frame_indices = np.array(
                sorted(set(visible_indices.tolist())
                       & set(chunk_and_inlier_indices.tolist())), int)
            if len(frame_indices) == 0:
                continue

            if sam:
                sam_labels = masks_to_image(
                    dataset.get_sam_mask(cam, points_index))
            if dino:
                dino_map = dataset.get_dinov2_features(cam, points_index)
                if dino_map.shape[2] > cfg.num_dino_features:
                    dino_map = reduce_feature_map(dino_map,
                                                  cfg.num_dino_features)
                elif dino_map.shape[2] != cfg.num_dino_features:
                    raise ValueError("num_dino_features must be <= the "
                                     "cached map depth (reference "
                                     "image_utils.py:256)")
                df0 = dino_map.shape[0] / h
                df1 = dino_map.shape[1] / w

            # visibility filter for the NC points: within MAJOR_VOXEL/2 of a
            # visible minor point (reference :259-283, KD-tree -> device NN)
            nc_cam = np.asarray(chunk_nc.points) @ T_pcd2cam[:3, :3].T \
                + T_pcd2cam[:3, 3]
            vis_pts = camframe[frame_indices]
            idx, d2 = nn1_bruteforce(jnp.asarray(nc_cam, jnp.float32),
                                     jnp.asarray(vis_pts, jnp.float32))
            near = np.sqrt(np.asarray(d2)) < cfg.major_voxel_size / 2
            nc_indices = np.where(near)[0]
            if len(nc_indices) == 0:
                continue

            pt_idx, pixels, _ = point_to_pixel_arrays(nc_cam[nc_indices], K,
                                                      h, w)
            for p, (px, py) in zip(pt_idx, pixels):
                if sam:
                    label = sam_labels[py, px]
                    if label:
                        point2sam_nc[nc_indices[p], i] = label
                if dino:
                    point2dino_nc[nc_indices[p], i, :] = dino_map[
                        int(df0 * py), int(df1 * px), :]

        if sam:
            point2sam_list.append(point2sam_nc)
        if dino:
            point2dino_list.append(point2dino_nc)

    return point2sam_list, point2dino_list


def image_affinity_terms(dataset, pcd_minor, chunk_indices, chunk_nc,
                         T_pcd, cam_indices, cfg, sam=False, dino=False):
    """(dino_terms: list of [N,F] view-means, sam_ids: list of [N,V])."""
    sam_list, dino_list = image_based_features_per_patch(
        dataset, pcd_minor, chunk_indices, chunk_nc, T_pcd, cam_indices,
        cfg, sam=sam, dino=dino)
    dino_terms = [dinov2_mean(p) for p in dino_list] if dino else []
    return dino_terms, sam_list
