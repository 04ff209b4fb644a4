"""Batched map processing equals the per-chunk path on the synthetic scene."""

import numpy as np
import pytest

from autoinst_tpu.datasets import create_kitti_odometry_dataset
from autoinst_tpu.pipeline.config import PipelineConfig, config_spatial
from autoinst_tpu.pipeline.run_pipeline import run

from synthetic_kitti import generate_sequence


@pytest.mark.slow
def test_batched_equals_sequential(tmp_path):
    root = tmp_path / "kitti"
    generate_sequence(str(root), n_scans=16, step=2.5, points_per_object=260,
                      ground_points=1800, n_objects=4, seed=9)
    factory = lambda seq: create_kitti_odometry_dataset(
        str(root), seq, ncuts_mode=True)

    def run_once(out, batched):
        cfg = PipelineConfig(
            dataset_path=str(root), config=dict(config_spatial), seqs=(0,),
            chunk_size=np.array([14, 14, 14]), overlap=3,
            metrics_min_points=120, ncut_method="eigh", ncut_backend="host",
            use_pallas=False, out_folder=str(out) + "/", min_map_scans=2,
            batched_chunks=batched)
        return run(cfg, dataset_factory=factory)

    r_seq = run_once(tmp_path / "o1", False)
    r_bat = run_once(tmp_path / "o2", True)
    s1 = r_seq[0]["sequence"]
    s2 = r_bat[0]["sequence"]
    # identical solver decisions => identical metrics
    for k in ("p", "r", "f1", "ap", "S_assoc"):
        assert s1[k] == pytest.approx(s2[k], abs=1e-9), (k, s1[k], s2[k])
