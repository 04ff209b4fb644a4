"""ICP registration + visualization overlay + GT semantic dataset tests."""

import numpy as np
import pytest

from autoinst_tpu.ops.registration import estimate_normals, \
    icp_point_to_plane


def make_surface(seed=0, n=1500):
    rng = np.random.default_rng(seed)
    # a bumpy ground plane + a wall: enough constraint for 6-dof
    xy = rng.uniform(-5, 5, (n, 2))
    z = 0.05 * np.sin(xy[:, 0]) + 0.03 * np.cos(2 * xy[:, 1])
    ground = np.column_stack([xy, z])
    wall_y = rng.uniform(-5, 5, (n // 3,))
    wall_z = rng.uniform(0, 2, (n // 3,))
    wall = np.column_stack([np.full_like(wall_y, 4.0)
                            + 0.05 * np.sin(wall_z * 3), wall_y, wall_z])
    return np.concatenate([ground, wall])


class TestICP:
    def test_recovers_small_transform(self):
        import jax.numpy as jnp
        target = make_surface()
        ang = 0.03
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
        t = np.array([0.08, -0.05, 0.02])
        T_true = np.eye(4)
        T_true[:3, :3] = R
        T_true[:3, 3] = t
        # source = T_true^-1 applied to target => ICP should find T_true
        Tinv = np.linalg.inv(T_true)
        source = target @ Tinv[:3, :3].T + Tinv[:3, 3]
        T = icp_point_to_plane(source, target, max_iterations=25)
        moved = source @ T[:3, :3].T + T[:3, 3]
        err = np.linalg.norm(moved - target, axis=1).mean()
        assert err < 0.02, err

    def test_normals_on_plane(self):
        import jax.numpy as jnp
        rng = np.random.default_rng(1)
        pts = np.column_stack([rng.uniform(-2, 2, (400, 2)),
                               np.full(400, 1.0)])
        n = np.asarray(estimate_normals(jnp.asarray(pts, jnp.float32)))
        assert np.abs(n[:, 2]).mean() > 0.99


class TestVisualization:
    def test_overlay_depth_and_labels(self):
        from autoinst_tpu.utils.visualization import unite_pcd_and_img
        K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
        img = np.zeros((48, 64, 3), np.uint8)
        rng = np.random.default_rng(2)
        pts = np.column_stack([rng.uniform(-1, 1, (200, 2)),
                               rng.uniform(3, 10, 200)])
        out = unite_pcd_and_img(pts, K, img, coloring="depth")
        assert out.shape == img.shape
        assert out.any(), "points must be painted"
        labels = rng.integers(0, 5, 200)
        out2 = unite_pcd_and_img(pts, K, img, labels=labels,
                                 coloring="labels")
        assert out2.any()


class TestSemanticDataset:
    def test_loads_scan_split(self, tmp_path):
        from autoinst_tpu.models.maskpls.semantic_dataset import \
            SemanticKittiScanDataset
        seq = tmp_path / "sequences" / "08"
        (seq / "velodyne").mkdir(parents=True)
        (seq / "labels").mkdir()
        rng = np.random.default_rng(3)
        n = 3000
        xyz = rng.uniform(-20, 20, (n, 3)) * [1, 1, 0.1]
        scan = np.column_stack([xyz, rng.uniform(0, 1, n)]).astype(np.float32)
        scan.tofile(seq / "velodyne" / "000000.bin")
        sem = np.full(n, 40, np.uint32)          # road
        sem[:500] = 10                           # car
        inst = np.zeros(n, np.uint32)
        inst[:500] = 7
        ((inst << 16) | sem).tofile(seq / "labels" / "000000.label")

        ds = SemanticKittiScanDataset(str(tmp_path), split="valid",
                                      min_points=50)
        assert len(ds) == 1
        item = ds[0]
        assert item["masks"].shape[0] == 2  # road (stuff) + one car (thing)
        assert 9 in item["classes"]         # road train-id
        assert 1 in item["classes"]         # car train-id
