"""End-to-end pipeline test on a synthetic sequence: run_pipeline through
aggregation, ground split, chunking, NCuts, merging and metrics."""

import numpy as np
import pytest

from autoinst_tpu.datasets import create_kitti_odometry_dataset
from autoinst_tpu.pipeline.config import (PipelineConfig, config_spatial,
                                          config_tarl_spatial)
from autoinst_tpu.pipeline.run_pipeline import run

from synthetic_kitti import generate_sequence


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_e2e")
    poses, objects = generate_sequence(
        str(root), n_scans=16, step=2.5, points_per_object=300,
        ground_points=2000, n_objects=5, seed=3)
    return str(root), poses, objects


def _cfg(root, out, weight_config):
    cfg = PipelineConfig(
        dataset_path=root,
        config=dict(weight_config),
        seqs=(0,),
        chunk_size=np.array([14, 14, 14]),
        overlap=3,
        metrics_min_points=120,
        ncut_method="eigh",
        use_pallas=False,
        out_folder=str(out) + "/",
        min_map_scans=2,
    )
    return cfg


@pytest.mark.parametrize("weight_config", [config_spatial, config_tarl_spatial],
                         ids=["spatial", "tarl_spatial"])
def test_pipeline_end_to_end(scene, tmp_path_factory, weight_config):
    root, _, objects = scene
    out = tmp_path_factory.mktemp("out_" + weight_config["name"])
    cfg = _cfg(root, out, weight_config)
    results = run(cfg, dataset_factory=lambda seq: create_kitti_odometry_dataset(
        root, seq, ncuts_mode=True))

    assert 0 in results
    seq_stats = results[0]["sequence"]
    # clean, well-separated synthetic objects: NCuts must nail them
    assert seq_stats["p"] > 0.7, seq_stats
    assert seq_stats["r"] > 0.7, seq_stats
    assert seq_stats["ap0.5"] > 0.6, seq_stats
    assert seq_stats["S_assoc"] > 0.6, seq_stats


def test_self_train_data_export(scene, tmp_path_factory):
    root, _, _ = scene
    out = tmp_path_factory.mktemp("out_train")
    cfg = _cfg(root, out, config_spatial)
    cfg.gen_self_train_data = True
    cfg.test_map = True  # post_init turned it off; force single map anyway
    run(cfg, dataset_factory=lambda seq: create_kitti_odometry_dataset(
        root, seq, ncuts_mode=True))

    import glob
    import os
    chunks = glob.glob(os.path.join(cfg.out_folder_train, "0", "*.npz"))
    assert chunks, "self-training chunks must be exported"
    data = np.load(chunks[0])
    for key in ("pts", "ncut_labels", "kitti_labels", "cluster_labels",
                "semantic"):
        assert key in data
    n = len(data["pts"])
    assert n > 0
    assert len(data["ncut_labels"]) == n
    assert data["pts"].shape[1] == 3


@pytest.mark.slow
def test_pipeline_device_backend(scene, tmp_path_factory):
    """Full pipeline through the device-resident worklist (CC seeding +
    tiered queues) — the production TPU path, on the CPU backend."""
    root, _, objects = scene
    out = tmp_path_factory.mktemp("out_device")
    cfg = _cfg(root, out, config_tarl_spatial)
    cfg.ncut_method = "lobpcg"
    cfg.ncut_backend = "device"
    cfg.batched_chunks = True
    results = run(cfg, dataset_factory=lambda seq: create_kitti_odometry_dataset(
        root, seq, ncuts_mode=True))
    seq_stats = results[0]["sequence"]
    assert seq_stats["p"] > 0.7, seq_stats
    assert seq_stats["r"] > 0.7, seq_stats
    assert seq_stats["ap0.5"] > 0.6, seq_stats
    assert seq_stats["S_assoc"] > 0.6, seq_stats
