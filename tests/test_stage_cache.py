"""Failure recovery: the preprocessing stages are idempotent caches, so a
re-run (e.g. after a crash) reuses artifacts instead of recomputing
(reference dataset_utils.py:153-154,204-205,390-391)."""

import os
import time

import numpy as np
import pytest

from autoinst_tpu.datasets import create_kitti_odometry_dataset
from autoinst_tpu.pipeline import stages

from synthetic_kitti import generate_sequence


def test_stage_caching_and_resume(tmp_path):
    root = tmp_path / "kitti"
    generate_sequence(str(root), n_scans=6, step=2.0, points_per_object=150,
                      ground_points=900, with_moving=False, tarl=False)
    ds = create_kitti_odometry_dataset(str(root), 0, ncuts_mode=True)
    out = str(tmp_path / "out") + "/"
    os.makedirs(out, exist_ok=True)

    stages.process_and_save_point_clouds(ds, 0, 6, out, sequence_num=0,
                                         cur_idx=0)
    assert os.path.exists(f"{out}non_ground0_0.pcd")
    mtime1 = os.path.getmtime(f"{out}non_ground0_0.pcd")

    # stage 1 re-run: cached, artifact untouched
    time.sleep(0.05)
    stages.process_and_save_point_clouds(ds, 0, 6, out, sequence_num=0,
                                         cur_idx=0)
    assert os.path.getmtime(f"{out}non_ground0_0.pcd") == mtime1

    stages.load_and_downsample_point_clouds(out, 0, 0.05, cur_idx=0)
    assert os.path.exists(f"{out}pcd_nonground_minor0_0.pcd")
    m2 = os.path.getmtime(f"{out}pcd_nonground_minor0_0.pcd")
    time.sleep(0.05)
    stages.load_and_downsample_point_clouds(out, 0, 0.05, cur_idx=0)
    assert os.path.getmtime(f"{out}pcd_nonground_minor0_0.pcd") == m2

    # "crash" after stage 2: deleting stage 3's artifact and resuming
    # recomputes ONLY stage 3 (stage 1/2 artifacts untouched)
    with np.load(f"{out}all_poses_0_0.npz") as d:
        all_poses = d["all_poses"]
    stages.subsample_and_extract_positions(all_poses, out, sequence_num=0,
                                           cur_idx=0)
    path3 = f"{out}subsampled_data0_0.npz"
    assert os.path.exists(path3)
    os.remove(path3)
    stages.subsample_and_extract_positions(all_poses, out, sequence_num=0,
                                           cur_idx=0)
    assert os.path.exists(path3)
    assert os.path.getmtime(f"{out}non_ground0_0.pcd") == mtime1

    # loaders round-trip
    (g, ng, labels, instances, poses, T) = stages.load_downsampled_pcds(
        out, 0, 0)
    assert len(ng) > 0 and len(g) > 0
    p, pos, sl, sg = stages.load_subsampled_data(out, 0, 0)
    assert len(sl) == len(sg) > 0
