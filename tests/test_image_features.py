"""Image feature back-projection tests: HPR, projection, DINO/SAM fusion."""

import numpy as np
import pytest

from autoinst_tpu.pipeline import image_features as imf
from autoinst_tpu.pipeline.config import PipelineConfig
from autoinst_tpu.datasets import create_kitti_odometry_dataset
from autoinst_tpu.utils.pointcloud import PointCloud

from synthetic_kitti import generate_sequence


class TestHPR:
    def test_sphere_front_visible(self):
        rng = np.random.default_rng(0)
        # unit sphere centered 5m in front of the camera on +z
        pts = rng.normal(size=(2000, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        pts[:, 2] += 5.0
        vis = imf.hidden_point_removal(pts, [0, 0, 0], radius_factor=100)
        z = pts[vis, 2]
        # visible points mostly on the near hemisphere (z < 5)
        assert (z < 5.0).mean() > 0.9
        # far-pole points hidden
        far = np.where(pts[:, 2] > 5.9)[0]
        assert len(set(far.tolist()) & set(vis.tolist())) < len(far) * 0.2

    def test_projection(self):
        K = np.array([[100.0, 0, 64], [0, 100.0, 32], [0, 0, 1]])
        pts = np.array([[0, 0, 10.0],      # center
                        [1.0, 0, 10.0],    # right 10px
                        [0, 0, -5.0],      # behind
                        [50.0, 0, 10.0]])  # out of image
        idx, pix, depth = imf.point_to_pixel_arrays(pts, K, 64, 128)
        assert list(idx) == [0, 1]
        assert list(pix[0]) == [64, 32]
        assert list(pix[1]) == [74, 32]
        np.testing.assert_allclose(depth, [10, 10])


class TestDinoMean:
    def test_matches_loop(self):
        rng = np.random.default_rng(1)
        p2d = rng.normal(size=(20, 4, 8))
        p2d[3] = 0            # never seen
        p2d[5, 1:] = 0        # one view
        out = imf.dinov2_mean(p2d)
        for i in range(20):
            seen = p2d[i].any(axis=1)
            expect = p2d[i][seen].mean(axis=0) if seen.any() else np.zeros(8)
            np.testing.assert_allclose(out[i], expect, atol=1e-12)


class TestIntegration:
    @pytest.fixture(scope="class")
    def scene(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("kitti_cam")
        generate_sequence(str(root), n_scans=4, cams=True,
                          points_per_object=150, ground_points=800)
        return str(root)

    def test_backprojection_shapes(self, scene):
        ds = create_kitti_odometry_dataset(scene, 0, ncuts_mode=True,
                                           correct_scan_calibration=False)
        cfg = PipelineConfig(dataset_path=scene, num_dino_features=384)
        # build a small "map" from scan 0 in world frame
        e0 = ds[0]
        T0 = ds.get_pose(0)
        world = e0.point_cloud @ T0[:3, :3].T + T0[:3, 3]
        pcd_minor = PointCloud(world)
        chunk_indices = np.arange(len(world))
        # major points: every 7th
        chunk_nc = PointCloud(world[::7])
        sam_list, dino_list = imf.image_based_features_per_patch(
            ds, pcd_minor, chunk_indices, chunk_nc, np.eye(4), [0, 1],
            cfg, sam=True, dino=True)
        assert len(sam_list) == 1 and len(dino_list) == 1
        assert sam_list[0].shape == (len(chunk_nc), 2)
        assert dino_list[0].shape == (len(chunk_nc), 2, 384)
        # some points must have been hit by the projection
        assert (sam_list[0] >= 0).any()
        assert dino_list[0].any()
        means = imf.dinov2_mean(dino_list[0])
        assert means.shape == (len(chunk_nc), 384)


def test_reduce_feature_map_pca():
    """num_dino_features < map depth: deterministic PCA reduction
    (reference's non-default UMAP knob, image_utils.py:236-250)."""
    rng = np.random.default_rng(0)
    # tokens concentrated along 3 directions in 20-d
    basis = rng.normal(size=(3, 20))
    codes = rng.normal(size=(48, 3)) * np.array([5.0, 2.0, 0.5])
    fm = (codes @ basis).reshape(8, 6, 20).astype(np.float32)
    red = imf.reduce_feature_map(fm, 4)
    assert red.shape == (8, 6, 4)
    # deterministic
    np.testing.assert_array_equal(red, imf.reduce_feature_map(fm, 4))
    # components are variance-ordered and capture nearly everything
    var = red.reshape(-1, 4).var(axis=0)
    assert var[0] >= var[1] >= var[2]
    total = fm.reshape(-1, 20)
    total = total - total.mean(0)
    assert var[:3].sum() / total.var(axis=0).sum() > 0.99
