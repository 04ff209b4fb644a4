"""GT chunk writing + self-training chunk export.

Behavioral ports of reference dataset_utils.py:465-487 (write_gt_chunk) and
:569-611 (store_train_chunks) with the identical npz schema
{pts, ncut_labels, kitti_labels, cluster_labels, semantic}.
"""

from __future__ import annotations

import os

import numpy as np

from autoinst_tpu.datasets.semantic_kitti import apply_learning_map
from autoinst_tpu.utils.colors import color_pcd_by_labels
from autoinst_tpu.utils.pcd_io import write_pcd
from autoinst_tpu.utils.pointcloud import PointCloud


def uniform_down_sample_indices(n: int, every_k: int) -> np.ndarray:
    return np.arange(0, n, every_k)


def downsample_chunk_train(points, kitti_chunk_labels, kitti_semantics,
                           cluster_labels, target: int = 60000):
    """(reference point_cloud_utils.py:225-235)"""
    every_k = max(int(kitti_chunk_labels.shape[0] / target), 1)
    idx = uniform_down_sample_indices(kitti_chunk_labels.shape[0], every_k)
    return (points[idx], kitti_chunk_labels[idx], kitti_semantics[idx],
            cluster_labels[idx])


def write_gt_chunk(out_folder, name, chunk_downsample_dict, sequence, colors,
                   instances, pcd_chunk_ground, inst_ground) -> PointCloud:
    """(reference dataset_utils.py:465-487)"""
    nonground = chunk_downsample_dict["pcd_nonground_chunks"][sequence]
    inst_nonground = chunk_downsample_dict["kitti_labels"]["nonground"][
        "instance"][sequence].reshape(-1)
    kitti_chunk_instance = color_pcd_by_labels(
        nonground.copy(), inst_nonground, colors=colors, gt_labels=instances)
    kitti_chunk_instance_ground = color_pcd_by_labels(
        pcd_chunk_ground.copy(), inst_ground.reshape(-1), colors=colors,
        gt_labels=instances)
    instance_pcd = kitti_chunk_instance + kitti_chunk_instance_ground
    write_pcd(out_folder, name, instance_pcd)
    return instance_pcd


def store_train_chunks(out_folder, name, merged_chunk: PointCloud,
                       gt_pcd: PointCloud, chunk_downsample_dict, sequence):
    """(reference dataset_utils.py:569-611)"""
    kl = chunk_downsample_dict["kitti_labels"]
    kitti_semantics = np.hstack((
        kl["nonground"]["semantic"][sequence].reshape(-1),
        kl["ground"]["semantic"][sequence].reshape(-1)))
    sem_labels = apply_learning_map(kitti_semantics)

    _, labels_kitti = np.unique(np.asarray(gt_pcd.colors), axis=0,
                                return_inverse=True)
    _, labels_ncuts = np.unique(np.asarray(merged_chunk.colors), axis=0,
                                return_inverse=True)

    pts = np.asarray(merged_chunk.points)
    points, labels_kitti, kitti_semantics, labels_ncuts = \
        downsample_chunk_train(pts, labels_kitti, kitti_semantics,
                               labels_ncuts)
    assert points.shape[0] == labels_kitti.shape[0] \
        == kitti_semantics.shape[0] == labels_ncuts.shape[0]

    np.savez(os.path.join(out_folder, name.split(".")[0] + ".npz"),
             pts=points,
             ncut_labels=labels_ncuts,
             kitti_labels=labels_kitti,
             cluster_labels=np.zeros_like(labels_ncuts),
             semantic=kitti_semantics)
