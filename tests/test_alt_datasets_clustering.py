"""nuScenes/Pandaset readers on synthetic fixtures + alternative clustering."""

import gzip
import json
import os
import pickle

import numpy as np
import pytest

from autoinst_tpu.datasets.nuscenes import (NuScenesDatasetConfig,
                                            NuScenesOdometryDataset,
                                            quaternion_to_rotation)
from autoinst_tpu.pipeline.clustering_alt import (curved_voxel_cluster,
                                                  dbscan_cluster,
                                                  _grid_dbscan)


def write_mini_nuscenes(root, n_samples=3):
    version = "v1.0-mini"
    os.makedirs(os.path.join(root, version), exist_ok=True)
    os.makedirs(os.path.join(root, "sweeps/LIDAR_TOP"), exist_ok=True)
    rng = np.random.default_rng(0)

    sensor = [{"token": "sen_lidar", "channel": "LIDAR_TOP",
               "modality": "lidar"}]
    calibrated = [{"token": "cs_lidar", "sensor_token": "sen_lidar",
                   "rotation": [1, 0, 0, 0], "translation": [0, 0, 1.8]}]
    samples, sds, egos = [], [], []
    for i in range(n_samples):
        tok = f"sample{i}"
        samples.append({
            "token": tok, "scene_token": "scene0",
            "next": f"sample{i+1}" if i + 1 < n_samples else "",
            "prev": f"sample{i-1}" if i else "",
        })
        egos.append({"token": f"ego{i}", "rotation": [1, 0, 0, 0],
                     "translation": [i * 2.0, 0, 0]})
        fname = f"sweeps/LIDAR_TOP/{i}.pcd.bin"
        pts = rng.uniform(-10, 10, (500, 5)).astype(np.float32)
        pts.tofile(os.path.join(root, fname))
        sds.append({"token": f"sd{i}", "sample_token": tok,
                    "ego_pose_token": f"ego{i}",
                    "calibrated_sensor_token": "cs_lidar",
                    "filename": fname, "is_key_frame": True})
    scene = [{"token": "scene0", "name": "scene-0001",
              "first_sample_token": "sample0"}]
    for name, rows in (("scene", scene), ("sample", samples),
                       ("sample_data", sds), ("ego_pose", egos),
                       ("calibrated_sensor", calibrated),
                       ("sensor", sensor)):
        with open(os.path.join(root, version, name + ".json"), "w") as fh:
            json.dump(rows, fh)


class TestNuScenes:
    def test_reader(self, tmp_path):
        write_mini_nuscenes(str(tmp_path))
        ds = NuScenesOdometryDataset(
            NuScenesDatasetConfig(dataset_path=str(tmp_path)), 0)
        assert len(ds) == 3
        T = ds.get_pose(1)
        np.testing.assert_allclose(T[:3, 3], [2.0, 0, 1.8])
        pc = ds.get_point_cloud(0)
        assert pc.shape == (500, 3)
        entry = ds[0]
        assert entry.point_cloud.shape == (500, 3)

    def test_quaternion(self):
        # 90deg about z
        q = (np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4))
        R = quaternion_to_rotation(q)
        np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)


class TestPandaset:
    def test_reader(self, tmp_path):
        seq = tmp_path / "001" / "lidar"
        seq.mkdir(parents=True)
        rng = np.random.default_rng(1)
        import pandas as pd
        poses = []
        for i in range(2):
            df = pd.DataFrame({
                "x": rng.uniform(-5, 5, 100) + i * 2.0,
                "y": rng.uniform(-5, 5, 100),
                "z": rng.uniform(-2, 0, 100),
                "i": rng.uniform(0, 1, 100),
            })
            with gzip.open(seq / f"{i:02d}.pkl.gz", "wb") as fh:
                pickle.dump(df, fh)
            poses.append({"position": {"x": i * 2.0, "y": 0, "z": 0},
                          "heading": {"w": 1, "x": 0, "y": 0, "z": 0}})
        with open(seq / "poses.json", "w") as fh:
            json.dump(poses, fh)

        from autoinst_tpu.datasets.pandaset import (PandasetDataset,
                                                    PandasetDatasetConfig)
        ds = PandasetDataset(
            PandasetDatasetConfig(dataset_path=str(tmp_path)), 1)
        assert len(ds) == 2
        pc = ds.get_point_cloud(1)
        assert pc.shape == (100, 3)
        # world->sensor: sensor-frame x should be roughly centered
        assert abs(pc[:, 0].mean()) < 4


def blobs(seed=0, k=3, n=60, spread=0.15, sep=5.0):
    rng = np.random.default_rng(seed)
    pts = np.concatenate([
        rng.normal(scale=spread, size=(n, 3)) + [i * sep, 0, 0]
        for i in range(k)])
    gt = np.repeat(np.arange(k), n)
    return pts, gt


class TestAltClustering:
    def test_dbscan_recovers_blobs(self):
        pts, gt = blobs()
        lab = dbscan_cluster(pts, eps=0.6, min_samples=5)
        assert len(np.unique(lab[lab >= 0])) == 3
        for i in range(3):
            assert len(np.unique(lab[gt == i][lab[gt == i] >= 0])) == 1

    def test_grid_dbscan_matches_sklearn(self):
        pts, _ = blobs(seed=2, k=2, n=50)
        from sklearn.cluster import DBSCAN
        ours = _grid_dbscan(pts, 0.6, 5)
        ref = DBSCAN(eps=0.6, min_samples=5).fit(pts).labels_
        # same partition structure (ids may permute)
        from oracles import partition_sets
        assert partition_sets(ours[ours >= 0]) == partition_sets(ref[ref >= 0])
        np.testing.assert_array_equal(ours == -1, ref == -1)

    def test_cvc_separates(self):
        pts, gt = blobs(seed=3, k=2, n=80, sep=8.0)
        pts += [10, 0, 0]  # keep away from origin (polar singularity)
        lab = curved_voxel_cluster(pts)
        # two groups far apart must land in different components
        assert lab[gt == 0].max() != lab[gt == 1].max() or \
            len(np.unique(lab)) >= 2


class TestNuScenesAggregation:
    def test_reader_feeds_aggregation(self, tmp_path):
        """The nuScenes reader plugs into the preprocessing stack."""
        root = tmp_path / "nusc"
        root.mkdir()
        write_mini_nuscenes(str(root), n_samples=3)
        # overwrite scans with structured scenes (ground + a box) so the
        # ground split has something to find
        rng = np.random.default_rng(7)
        for i in range(3):
            ground = np.column_stack([
                rng.uniform(-15, 15, 800), rng.uniform(-15, 15, 800),
                np.full(800, -1.8) + rng.normal(scale=0.02, size=800)])
            box = np.array([6.0, 2.0, -0.9]) + rng.uniform(
                -0.8, 0.8, (150, 3))
            pts = np.concatenate([ground, box])
            scan = np.column_stack(
                [pts, rng.uniform(0, 1, (len(pts), 2))]).astype(np.float32)
            scan.tofile(root / "sweeps/LIDAR_TOP" / f"{i}.pcd.bin")

        from autoinst_tpu.datasets.nuscenes import (NuScenesDatasetConfig,
                                                    NuScenesOdometryDataset)
        from autoinst_tpu.pipeline.aggregation import aggregate_pointcloud
        ds = NuScenesOdometryDataset(
            NuScenesDatasetConfig(dataset_path=str(root)), 0)
        g, ng, poses, T, labels = aggregate_pointcloud(ds, 0, 3)
        assert len(g) > 1000      # ground found across scans
        assert len(ng) > 200      # the boxes stay non-ground
        assert len(poses) == 3
        assert len(labels["seg_ground"]) == 3
