"""Idempotent preprocessing stages with the reference's on-disk cache layout.

Each stage checks its output artifact and returns early, so a crashed run
resumes at stage granularity -- artifact names match the reference exactly
(dataset_utils.py:144-463): ground/non_ground .pcd, all_poses_*.npz,
kitti_labels_*.npz, pcd_*_minor .pcd, kitti_labels_preprocessed*.npz,
subsampled_data*.npz.
"""

from __future__ import annotations

import os

import numpy as np

from autoinst_tpu.hostops import grid_nn1, voxel_downsample_np
from autoinst_tpu.pipeline.aggregation import aggregate_pointcloud
from autoinst_tpu.pipeline.chunking import (chunks_from_pointcloud,
                                            subsample_positions)
from autoinst_tpu.utils.colors import color_pcd_by_labels, \
    generate_random_colors_map
from autoinst_tpu.utils.pcd_io import read_pcd_file, write_pcd, write_pcd_file
from autoinst_tpu.utils.pointcloud import PointCloud


def process_and_save_point_clouds(dataset, ind_start, ind_end, out_folder,
                                  ground_segmentation_method="patchwork",
                                  icp=False, sequence_num=7, cur_idx=0):
    """Stage 1: aggregate the map + persist (reference dataset_utils.py:144-197)."""
    if os.path.exists(f"{out_folder}non_ground{sequence_num}_{cur_idx}.pcd"):
        return
    os.makedirs(out_folder, exist_ok=True)

    pcd_ground, pcd_nonground, all_poses, T_pcd, labels = aggregate_pointcloud(
        dataset, ind_start, ind_end,
        ground_segmentation=ground_segmentation_method, icp=icp)

    seq = str(sequence_num)
    write_pcd_file(f"{out_folder}ground{seq}_{cur_idx}.pcd", pcd_ground)
    write_pcd_file(f"{out_folder}non_ground{seq}_{cur_idx}.pcd", pcd_nonground)
    np.savez(f"{out_folder}all_poses_{seq}_{cur_idx}.npz",
             all_poses=np.array(all_poses), T_pcd=T_pcd)
    np.savez(f"{out_folder}kitti_labels_{seq}_{cur_idx}.npz",
             seg_ground=np.vstack(labels["seg_ground"]),
             seg_nonground=np.vstack(labels["seg_nonground"]),
             instance_ground=np.vstack(labels["instance_ground"]),
             instance_nonground=np.vstack(labels["instance_nonground"]))


def load_and_downsample_point_clouds(out_folder, sequence_num, minor_voxel_size,
                                     ground_mode="patchwork", cur_idx=0):
    """Stage 2: voxel-downsample the map + 1-NN label/color transfer
    (reference dataset_utils.py:201-384).

    The reference's four per-point Python KD-tree loops collapse into one
    exact grid 1-NN per map half: the nearest original point of each voxel
    centroid supplies both GT colors and raw label ids.
    """
    if os.path.exists(
            f"{out_folder}pcd_nonground_minor{sequence_num}_{cur_idx}.pcd"):
        return

    with np.load(f"{out_folder}all_poses_{sequence_num}_{cur_idx}.npz") as d:
        pass  # poses unused here; presence validates stage 1 ran

    pcd_ground = read_pcd_file(f"{out_folder}ground{sequence_num}_{cur_idx}.pcd")
    pcd_nonground = read_pcd_file(
        f"{out_folder}non_ground{sequence_num}_{cur_idx}.pcd")

    with np.load(f"{out_folder}kitti_labels_{sequence_num}_{cur_idx}.npz") as d:
        kitti = {k: d[k] for k in ("seg_ground", "seg_nonground",
                                   "instance_ground", "instance_nonground")}

    instances = np.hstack((kitti["instance_nonground"].reshape(-1),
                           kitti["instance_ground"].reshape(-1)))
    colors = generate_random_colors_map(600)
    inst_ng_colored = color_pcd_by_labels(pcd_nonground,
                                          kitti["instance_nonground"],
                                          colors=colors, gt_labels=instances)
    inst_g_colored = color_pcd_by_labels(pcd_ground, kitti["instance_ground"],
                                         colors=colors, gt_labels=instances)

    out = {}
    minor = {}
    for half, pcd, inst_colored, ikey, skey in (
            ("ground", pcd_ground, inst_g_colored, "instance_ground",
             "seg_ground"),
            ("nonground", pcd_nonground, inst_ng_colored,
             "instance_nonground", "seg_nonground")):
        cent, _, _ = voxel_downsample_np(pcd.points, minor_voxel_size,
                                         min_bound=pcd.get_min_bound())
        nn, _ = grid_nn1(cent, pcd.points, cell=minor_voxel_size)
        minor[half] = PointCloud(cent, inst_colored.colors[nn])
        out[ikey] = kitti[ikey].reshape(-1)[nn]
        out[skey] = kitti[skey].reshape(-1)[nn]

    write_pcd(out_folder, "pcd_ground_minor", minor["ground"],
              sequence_num, cur_idx)
    write_pcd(out_folder, "pcd_nonground_minor", minor["nonground"],
              sequence_num, cur_idx)
    np.savez(f"{out_folder}kitti_labels_preprocessed{sequence_num}_{cur_idx}.npz",
             instance_nonground=out["instance_nonground"],
             instance_ground=out["instance_ground"],
             seg_ground=out["seg_ground"],
             seg_nonground=out["seg_nonground"])


def subsample_and_extract_positions(all_poses, out_folder, voxel_size=1,
                                    ind_start=0, sequence_num=0, cur_idx=0):
    """Stage 3: ~1m pose lattice subsample (reference dataset_utils.py:387-415)."""
    if os.path.exists(f"{out_folder}subsampled_data{sequence_num}_{cur_idx}.npz"):
        return
    all_positions = np.array([p[:3, 3] for p in all_poses])
    sampled_local = subsample_positions(all_positions, voxel_size=voxel_size)
    sampled_global = sampled_local + ind_start
    np.savez(f"{out_folder}subsampled_data{sequence_num}_{cur_idx}.npz",
             poses=np.array(all_poses)[sampled_local],
             positions=all_positions[sampled_local],
             sampled_indices_global=sampled_global,
             sampled_indices_local=sampled_local)


def load_downsampled_pcds(out_folder, seq, cur_idx):
    """(reference dataset_utils.py:417-453)"""
    pcd_ground_minor = read_pcd_file(
        f"{out_folder}pcd_ground_minor{seq}_{cur_idx}.pcd")
    pcd_nonground_minor = read_pcd_file(
        f"{out_folder}pcd_nonground_minor{seq}_{cur_idx}.pcd")
    with np.load(
            f"{out_folder}kitti_labels_preprocessed{seq}_{cur_idx}.npz") as d:
        labels = {k: d[k] for k in ("instance_ground", "instance_nonground",
                                    "seg_nonground", "seg_ground")}
    with np.load(f"{out_folder}all_poses_{seq}_{cur_idx}.npz") as d:
        all_poses, T_pcd = d["all_poses"], d["T_pcd"]
    instances = np.hstack((labels["instance_nonground"].reshape(-1),
                           labels["instance_ground"].reshape(-1)))
    return (pcd_ground_minor, pcd_nonground_minor, labels, instances,
            all_poses, T_pcd)


def load_subsampled_data(out_folder, seq, cur_idx):
    """(reference dataset_utils.py:455-463)"""
    with np.load(f"{out_folder}subsampled_data{seq}_{cur_idx}.npz") as d:
        return (d["poses"], d["positions"],
                list(d["sampled_indices_local"]),
                list(d["sampled_indices_global"]))


def chunk_and_downsample_point_clouds(pcd_nonground_minor, pcd_ground_minor,
                                      T_pcd, positions, first_position,
                                      sampled_indices_global, chunk_size,
                                      overlap, major_voxel_size,
                                      kitti_labels=None):
    """Stage 4: chunk both halves + 0.35m major downsample of each chunk
    (reference dataset_utils.py:489-567)."""
    (pcd_nonground_chunks, indices, center_positions, center_ids,
     chunk_bounds, kitti_out, obbs) = chunks_from_pointcloud(
        pcd_nonground_minor, T_pcd, positions, first_position,
        sampled_indices_global, chunk_size, overlap, labels=kitti_labels)

    (pcd_ground_chunks, indices_ground, _, _, _, kitti_out_ground, _) = \
        chunks_from_pointcloud(
            pcd_ground_minor, T_pcd, positions, first_position,
            sampled_indices_global, chunk_size, overlap, labels=kitti_labels,
            ground=True)

    major_ng, major_g = [], []
    for ground, nonground in zip(pcd_ground_chunks, pcd_nonground_chunks):
        for src, dst in ((nonground, major_ng), (ground, major_g)):
            if len(src.points):
                cent, _, _ = voxel_downsample_np(src.points, major_voxel_size)
                dst.append(PointCloud(cent))
            else:
                dst.append(PointCloud())

    return {
        "pcd_nonground_chunks": pcd_nonground_chunks,
        "pcd_ground_chunks": pcd_ground_chunks,
        "pcd_nonground_chunks_major_downsampling": major_ng,
        "pcd_ground_chunks_major_downsampling": major_g,
        "indices": indices,
        "indices_ground": indices_ground,
        "center_positions": center_positions,
        "center_ids": center_ids,
        "chunk_bounds": chunk_bounds,
        "kitti_labels": {"nonground": kitti_out, "ground": kitti_out_ground},
        "obbs": obbs,
    }
