"""KITTI reader + filter chain tests on a synthetic on-disk sequence."""

import numpy as np
import pytest

from autoinst_tpu.datasets import create_kitti_odometry_dataset
from autoinst_tpu.datasets.kitti import KittiOdometryDataset, \
    KittiOdometryDatasetConfig
from autoinst_tpu.datasets.semantic_kitti import MOVING_LABEL_START

from synthetic_kitti import generate_sequence, GROUND_SEM, OBJECT_SEM


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    poses, objects = generate_sequence(str(root))
    return str(root), poses, objects


def test_poses_parsed_velodyne_frame(kitti_root):
    root, poses, _ = kitti_root
    ds = create_kitti_odometry_dataset(root, 0, ncuts_mode=False,
                                       correct_scan_calibration=False)
    assert len(ds) == len(poses)
    for i in range(len(poses)):
        np.testing.assert_allclose(ds.get_pose(i), poses[i], atol=1e-6)


def test_label_bit_decoding(kitti_root):
    root, _, _ = kitti_root
    ds = create_kitti_odometry_dataset(root, 0, ncuts_mode=False,
                                       correct_scan_calibration=False)
    sem = ds.get_semantic_labels(0).ravel()
    pan = ds.get_panoptic_labels(0).ravel()
    assert set(np.unique(sem)) <= {GROUND_SEM, OBJECT_SEM, 252}
    # ground has no instance id -> panoptic backfilled with semantic
    assert (pan[sem == GROUND_SEM] == GROUND_SEM).all()
    # objects keep their shifted instance ids
    obj = pan[sem == OBJECT_SEM]
    assert (obj >= (1 << 16)).all()


def test_moving_object_filter_drops_moving(kitti_root):
    root, _, _ = kitti_root
    ds = create_kitti_odometry_dataset(root, 0, ncuts_mode=True,
                                       correct_scan_calibration=False)
    entry = ds[0]
    assert (entry.semantic_labels.ravel() < MOVING_LABEL_START).all()
    # range filter: all within 3..25m
    norms = np.linalg.norm(entry.point_cloud[:, :3], axis=1)
    assert norms.min() >= 3.0 and norms.max() <= 25.0
    # shapes consistent
    n = len(entry.point_cloud)
    assert len(entry.intensity) == n
    assert len(entry.panoptic_labels) == n


def test_world_reconstruction_consistency(kitti_root):
    """Points from different scans of the same static object land at the
    same world position after pose transforms."""
    root, poses, objects = kitti_root
    ds = create_kitti_odometry_dataset(root, 0, ncuts_mode=True,
                                       correct_scan_calibration=False)
    center0, size0 = objects[0][:2]
    hits = []
    for i in (0, 1):
        e = ds[i]
        T = ds.get_pose(i)
        world = e.point_cloud[:, :3] @ T[:3, :3].T + T[:3, 3]
        m = np.all(np.abs(world - center0) < size0 * 0.51 + 1e-3, axis=1)
        if m.sum():
            hits.append(world[m].mean(axis=0))
    assert len(hits) == 2
    np.testing.assert_allclose(hits[0], hits[1], atol=0.25)


def test_tarl_cache_roundtrip(kitti_root):
    root, _, _ = kitti_root
    ds = create_kitti_odometry_dataset(root, 0, ncuts_mode=False,
                                       correct_scan_calibration=False)
    feats = ds.get_tarl_features(0)
    raw = np.fromfile(f"{root}/sequences/00/velodyne/000000.bin",
                      np.float32).reshape(-1, 4)
    assert feats.shape == (len(raw), 96)
    assert feats.dtype == np.float32


def test_scan_cache(kitti_root):
    root, _, _ = kitti_root
    ds = create_kitti_odometry_dataset(root, 0, ncuts_mode=False)
    a = ds.get_point_cloud(0)
    b = ds.get_point_cloud(0)
    assert a is b  # memoized


def test_calibration_matrices(kitti_root):
    root, _, _ = kitti_root
    ds = create_kitti_odometry_dataset(root, 0, ncuts_mode=False)
    T, K = ds.get_calibration_matrices("cam2")
    assert T.shape == (4, 4) and K.shape == (3, 3)
    assert K[0, 0] > 0
