"""Unit tests for the array substrate: geometry, voxel, neighbors."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial import cKDTree

from autoinst_tpu.ops import geometry, voxel, neighbors


def rand_pts(n, seed=0, scale=10.0):
    rng = np.random.default_rng(seed)
    return (rng.uniform(-1, 1, size=(n, 3)) * scale).astype(np.float32)


class TestGeometry:
    def test_transform_roundtrip(self):
        rng = np.random.default_rng(1)
        # random rotation via QR
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = q
        T[:3, 3] = rng.normal(size=3)
        pts = rand_pts(100)
        out = geometry.transform_points(jnp.asarray(pts), jnp.asarray(T))
        back = geometry.transform_points(out, geometry.invert_transform(jnp.asarray(T)))
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)

    def test_transform_matches_homogeneous(self):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [1, 2, 3]
        pts = rand_pts(10)
        out = geometry.transform_points(jnp.asarray(pts), jnp.asarray(T))
        homog = np.column_stack([pts, np.ones(len(pts))])
        expect = np.einsum("jk,ik->ij", T, homog)[:, :3]
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)

    def test_calibration_correction_matches_dense_rodrigues(self):
        # oracle: build the full (N,3,3) rotation matrices as the reference does
        pts = rand_pts(50, seed=2)
        xyz = pts
        z = np.tile(np.array([[0, 0, 1]], dtype=np.float32), (len(xyz), 1))
        axes = np.cross(xyz, z)
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        theta = 0.205 * np.pi / 180.0
        c, s = np.cos(theta), np.sin(theta)
        n = len(xyz)
        u_outer = axes.reshape(n, 3, 1) * axes.reshape(n, 1, 3)
        u_cross = np.zeros((n, 3, 3), dtype=np.float32)
        u_cross[:, 0, 1] = -axes[:, 2]
        u_cross[:, 1, 0] = axes[:, 2]
        u_cross[:, 0, 2] = axes[:, 1]
        u_cross[:, 2, 0] = -axes[:, 1]
        u_cross[:, 1, 2] = -axes[:, 0]
        u_cross[:, 2, 1] = axes[:, 0]
        eye = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
        rot = c * eye + s * u_cross + (1 - c) * u_outer
        expect = np.einsum("nij,nj->ni", rot, xyz)
        got = geometry.correct_kitti_scan_calibration(jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(got), expect, atol=1e-4)

    def test_range_mask(self):
        pts = np.array([[0.5, 0, 0], [5, 0, 0], [30, 0, 0]], np.float32)
        m = geometry.range_mask(jnp.asarray(pts), 3.0, 25.0)
        assert list(np.asarray(m)) == [False, True, False]


class TestVoxel:
    def test_centroids_match_numpy(self):
        pts = rand_pts(500, seed=3)
        vs = 0.9
        mb = pts.min(axis=0)
        span = pts.max(axis=0) - mb
        gs = tuple(int(np.floor(s / vs)) + 1 for s in span)
        cent, counts, vvalid, inverse, nvox = voxel.voxel_downsample(
            jnp.asarray(pts), vs, jnp.asarray(mb), gs, max_voxels=512)
        cent, counts = np.asarray(cent), np.asarray(counts)
        vvalid, inverse = np.asarray(vvalid), np.asarray(inverse)

        keys = np.floor((pts - mb) / vs).astype(np.int64)
        keys = (keys[:, 0] * gs[1] + keys[:, 1]) * gs[2] + keys[:, 2]
        uniq = np.unique(keys)
        assert int(nvox) == len(uniq)
        assert vvalid.sum() == len(uniq)
        for slot in range(len(uniq)):
            members = inverse == slot
            np.testing.assert_allclose(cent[slot], pts[members].mean(axis=0),
                                       atol=1e-4)
            assert counts[slot] == members.sum()
        # slots ordered by ascending key
        slot_keys = [keys[inverse == s][0] for s in range(len(uniq))]
        assert slot_keys == sorted(slot_keys)

    def test_invalid_points_ignored(self):
        pts = np.array([[0, 0, 0], [0.1, 0, 0], [99, 99, 99]], np.float32)
        valid = np.array([True, True, False])
        cent, counts, vvalid, inverse, nvox = voxel.voxel_downsample(
            jnp.asarray(pts), 1.0, jnp.zeros(3), (100, 100, 100), 8,
            valid=jnp.asarray(valid))
        assert int(nvox) == 1
        np.testing.assert_allclose(np.asarray(cent)[0], [0.05, 0, 0], atol=1e-5)

    def test_uniform_downsample_reference_semantics(self):
        idx = np.asarray(voxel.uniform_downsample_indices(10, 3))
        # k = floor(10/3) = 3 -> [0,3,6,9]
        assert list(idx) == [0, 3, 6, 9]
        idx = np.asarray(voxel.uniform_downsample_indices(5, 100))
        assert list(idx) == [0, 1, 2, 3, 4]


class TestNeighbors:
    def test_nn1_matches_kdtree(self):
        q = rand_pts(300, seed=4)
        r = rand_pts(200, seed=5)
        idx, d2 = neighbors.nn1_bruteforce(jnp.asarray(q), jnp.asarray(r),
                                           block=128)
        tree = cKDTree(r)
        dist, expect = tree.query(q, k=1)
        np.testing.assert_array_equal(np.asarray(idx), expect)
        np.testing.assert_allclose(np.sqrt(np.asarray(d2)), dist, atol=1e-3)

    def test_knn_matches_kdtree(self):
        q = rand_pts(100, seed=6)
        r = rand_pts(150, seed=7)
        idx, d2 = neighbors.knn_bruteforce(jnp.asarray(q), jnp.asarray(r), 5,
                                           block=64)
        dist, expect = cKDTree(r).query(q, k=5)
        np.testing.assert_allclose(np.sqrt(np.asarray(d2)), dist, atol=1e-3)

    def test_radius_mean_pool(self):
        q = np.array([[0, 0, 0], [10, 10, 10]], np.float32)
        r = np.array([[0.1, 0, 0], [0, 0.1, 0], [5, 5, 5]], np.float32)
        f = np.array([[1.0, 0], [3.0, 0], [100.0, 0]], np.float32)
        pooled, counts = neighbors.radius_mean_pool(
            jnp.asarray(q), jnp.asarray(r), jnp.asarray(f), 0.5, block=8)
        np.testing.assert_allclose(np.asarray(pooled)[0], [2.0, 0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(pooled)[1], [0, 0], atol=1e-5)
        assert list(np.asarray(counts)) == [2, 0]

    def test_statistical_inliers_flags_outlier(self):
        rng = np.random.default_rng(8)
        cloud = rng.normal(scale=0.3, size=(200, 3)).astype(np.float32)
        cloud[0] = [50, 50, 50]  # blatant outlier
        m = neighbors.statistical_inlier_mask(jnp.asarray(cloud), block=64)
        m = np.asarray(m)
        assert not m[0]
        assert m[1:].mean() > 0.9

    def test_statistical_inliers_host_matches_device(self):
        # the KD-tree host path (hostops/outliers.py) must reproduce the
        # blocked device bruteforce exactly -- it replaces it whenever the
        # backend is not TPU (pipeline/chunking.statistical_inlier_indices)
        from autoinst_tpu.hostops.outliers import statistical_inlier_mask_host
        rng = np.random.default_rng(12)
        cloud = np.concatenate([
            rng.normal(scale=0.4, size=(800, 3)),
            rng.uniform(-30, 30, size=(25, 3))]).astype(np.float32)
        dev = np.asarray(neighbors.statistical_inlier_mask(
            jnp.asarray(cloud), block=256))
        host = statistical_inlier_mask_host(cloud)
        assert (dev == host).all()

    def test_padding_respected(self):
        q = rand_pts(10, seed=9)
        r = np.concatenate([rand_pts(5, seed=10), np.zeros((5, 3), np.float32)])
        valid = np.array([True] * 5 + [False] * 5)
        idx, _ = neighbors.nn1_bruteforce(jnp.asarray(q), jnp.asarray(r),
                                          ref_valid=jnp.asarray(valid), block=8)
        assert np.asarray(idx).max() < 5


def test_remove_duplicated_points_filters_colors():
    """r2 regression: dedupe must filter colors alongside points (the old
    order of operations left colors at the pre-dedupe length, silently
    misaligning every merged map with overlapping chunks)."""
    from autoinst_tpu.utils.pointcloud import PointCloud
    pts = np.array([[0, 0, 0], [1, 1, 1], [0, 0, 0], [2, 2, 2]], float)
    cols = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], float)
    pc = PointCloud(pts, cols).remove_duplicated_points()
    assert len(pc.points) == 3
    assert len(pc.colors) == 3
    # first occurrence wins
    assert np.array_equal(pc.colors,
                          np.array([[1, 0, 0], [0, 1, 0], [1, 1, 0]]))


def test_merge_unite_gt_alignment_with_overlap():
    from autoinst_tpu.utils.pointcloud import PointCloud
    from autoinst_tpu.pipeline.merging import (merge_unite_gt,
                                               merge_chunks_unite_instances)
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 5, (200, 3))
    b = np.concatenate([a[150:], rng.uniform(5, 9, (120, 3))])  # 50 dups
    ca = np.tile([[1.0, 0, 0]], (len(a), 1))
    cb = np.tile([[0, 1.0, 0]], (len(b), 1))
    m = merge_unite_gt([PointCloud(a, ca), PointCloud(b, cb)])
    assert len(m.points) == len(m.colors) == 320
    m2 = merge_chunks_unite_instances([PointCloud(a, ca),
                                       PointCloud(b, cb)])
    assert len(m2.points) == len(m2.colors) == 320
