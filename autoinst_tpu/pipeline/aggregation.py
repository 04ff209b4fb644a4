"""Map aggregation: per-scan ground split + pose transform + accumulation.

Equivalent of the reference aggregate_pointcloud
(pipeline/utils/point_cloud/aggregate_pointcloud.py:12-188), with the
Patchwork++ C++ binding replaced by the jit-compiled concentric-zone ground
segmentation (autoinst_tpu.ground), run in padded size buckets so the whole
sequence reuses a handful of compiled programs.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from autoinst_tpu.ground import GroundConfig, estimate_ground
from autoinst_tpu.utils.pointcloud import PointCloud

_BUCKET = 8192


def _pad_bucket(points: np.ndarray):
    n = len(points)
    m = ((n + _BUCKET - 1) // _BUCKET) * _BUCKET
    out = np.zeros((m, 3), np.float32)
    out[:n] = points[:, :3]
    valid = np.zeros(m, bool)
    valid[:n] = True
    return out, valid


def ground_split_indices(points: np.ndarray,
                         cfg: GroundConfig = GroundConfig()):
    """(ground_idcs, nonground_idcs) for one scan, Patchwork++-style."""
    padded, valid = _pad_bucket(points)
    mask = np.asarray(estimate_ground(jnp.asarray(padded),
                                      jnp.asarray(valid), cfg))[:len(points)]
    return np.where(mask)[0], np.where(~mask)[0]


def aggregate_pointcloud(dataset, ind_start: int, ind_end: int,
                         icp: bool = False,
                         ground_segmentation: str | None = "patchwork",
                         ground_cfg: GroundConfig = GroundConfig()):
    """Aggregate scans [ind_start, ind_end) into world-frame ground/nonground
    maps with per-scan label lists (reference aggregate_pointcloud.py:89-188).

    Returns (map_ground, map_nonground, poses, world_pose, labels_dict).
    With icp=True, each scan's pose is refined against the running map by
    point-to-plane ICP (reference aggregate_pointcloud.py:141-159; off by
    default there too, dataset_utils.py:149).
    """
    if ground_segmentation is None:
        raise ValueError("the instance pipeline requires ground segmentation")

    poses = []
    world_pose = np.eye(4)
    acc = {k: [] for k in ("seg_ground", "seg_nonground", "instance_ground",
                           "instance_nonground", "panoptic_ground",
                           "panoptic_nonground")}
    pts_ground, pts_nonground = [], []

    icp_map: list = []  # downsampled running map for ICP refinement
    for i in range(ind_start, ind_end):
        entry = dataset[i]
        pose = dataset.get_pose(i)
        poses.append(pose)
        transform = pose

        if icp and i != ind_start and icp_map:
            from autoinst_tpu.hostops import voxel_downsample_np
            from autoinst_tpu.ops.registration import icp_point_to_plane
            # register against the recent neighborhood of the map (bounded
            # memory; the reference uses the full map + 0.3m downsample,
            # aggregate_pointcloud.py:143-144)
            merged = np.concatenate(icp_map[-8:])
            ref, _, _ = voxel_downsample_np(merged, 0.3)
            transform = icp_point_to_plane(entry.point_cloud[:, :3], ref,
                                           init=pose, max_distance=0.9,
                                           max_iterations=20)

        g_idcs, ng_idcs = ground_split_indices(entry.point_cloud, ground_cfg)

        acc["panoptic_ground"].append(entry.panoptic_labels[g_idcs])
        acc["panoptic_nonground"].append(entry.panoptic_labels[ng_idcs])
        acc["seg_ground"].append(entry.semantic_labels[g_idcs])
        acc["seg_nonground"].append(entry.semantic_labels[ng_idcs])
        acc["instance_ground"].append(entry.instance_labels[g_idcs].copy())
        acc["instance_nonground"].append(entry.instance_labels[ng_idcs].copy())

        world = entry.point_cloud[:, :3] @ transform[:3, :3].T \
            + transform[:3, 3]
        pts_ground.append(world[g_idcs])
        pts_nonground.append(world[ng_idcs])
        if icp:
            icp_map.append(world)

    map_ground = PointCloud(np.concatenate(pts_ground))
    map_nonground = PointCloud(np.concatenate(pts_nonground))
    return map_ground, map_nonground, poses, world_pose, acc
