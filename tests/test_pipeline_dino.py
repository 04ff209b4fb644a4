"""End-to-end pipeline with the DINO-fused config (gamma path): exercises
camera back-projection inside ncuts_chunk on a synthetic sequence."""

import numpy as np
import pytest

from autoinst_tpu.datasets import create_kitti_odometry_dataset
from autoinst_tpu.pipeline.config import PipelineConfig, \
    config_tarl_spatial_dino
from autoinst_tpu.pipeline.run_pipeline import run

from synthetic_kitti import generate_sequence


@pytest.mark.slow
def test_dino_config_pipeline(tmp_path):
    root = tmp_path / "kitti"
    generate_sequence(str(root), n_scans=14, step=2.5, points_per_object=260,
                      ground_points=1500, n_objects=4, seed=11, cams=True)
    out = tmp_path / "out"
    cfg = PipelineConfig(
        dataset_path=str(root), config=dict(config_tarl_spatial_dino),
        seqs=(0,), chunk_size=np.array([14, 14, 14]), overlap=3,
        metrics_min_points=120, ncut_method="eigh", ncut_backend="host",
        use_pallas=False, out_folder=str(out) + "/", min_map_scans=2,
        adjacent_frames_cam=(3, 3), cam_ids=(0,))
    results = run(cfg, dataset_factory=lambda s: create_kitti_odometry_dataset(
        str(root), s, ncuts_mode=True))
    seq_stats = results[0]["sequence"]
    # random DINO features perturb but must not break the pipeline;
    # geometry still separates the objects reasonably
    for key in ("p", "r", "f1", "ap", "S_assoc"):
        assert np.isfinite(seq_stats[key])
    assert seq_stats["r"] > 0.4, seq_stats
