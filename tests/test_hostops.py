"""Host kernels: map-scale voxel downsample + grid 1-NN (numpy and C++)."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from autoinst_tpu.hostops import voxel_downsample_np, grid_nn1
from autoinst_tpu.hostops.grid_nn import grid_nn1_np, grid_nn1_native


def clouds(seed=0, m=500, n=4000, scale=30.0):
    rng = np.random.default_rng(seed)
    q = rng.uniform(-scale, scale, size=(m, 3))
    r = rng.uniform(-scale, scale, size=(n, 3))
    return q, r


class TestVoxelNp:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-5, 5, size=(2000, 3))
        cent, inv, counts = voxel_downsample_np(pts, 0.5)
        assert counts.sum() == len(pts)
        for v in (0, len(cent) // 2, len(cent) - 1):
            members = inv == v
            np.testing.assert_allclose(cent[v], pts[members].mean(axis=0))

    def test_far_from_origin(self):
        rng = np.random.default_rng(2)
        pts = rng.uniform(0, 10, size=(500, 3)) + 1000.0
        cent, inv, counts = voxel_downsample_np(pts, 0.3)
        assert (counts > 0).all()
        assert np.abs(cent - 1005).max() < 6


class TestGridNN:
    @pytest.mark.parametrize("fn", [grid_nn1_np, grid_nn1])
    def test_matches_kdtree(self, fn):
        q, r = clouds()
        idx, dist = fn(q, r, cell=2.0)
        d_exp, i_exp = cKDTree(r).query(q, k=1)
        np.testing.assert_array_equal(idx, i_exp)
        np.testing.assert_allclose(dist, d_exp, atol=1e-9)

    def test_native_available_and_exact(self):
        q, r = clouds(seed=3, m=2000, n=20000)
        out = grid_nn1_native(q, r, cell=1.0)
        assert out is not None, "C++ kernel must build in this environment"
        idx, dist = out
        d_exp, i_exp = cKDTree(r).query(q, k=1)
        np.testing.assert_array_equal(idx, i_exp)
        np.testing.assert_allclose(dist, d_exp, atol=1e-9)

    def test_sparse_far_clusters(self):
        # widely separated clusters force multi-shell searches
        rng = np.random.default_rng(4)
        r = np.concatenate([rng.normal(size=(50, 3)),
                            rng.normal(size=(50, 3)) + 500.0])
        q = rng.normal(size=(20, 3)) + 250.0
        idx, dist = grid_nn1(q, r, cell=0.5)
        d_exp, i_exp = cKDTree(r).query(q, k=1)
        np.testing.assert_array_equal(idx, i_exp)
