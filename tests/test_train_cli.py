"""Train/eval CLI round trip on a tiny pseudo-label dataset (CPU)."""

import json
import os

import numpy as np
import pytest

from autoinst_tpu.models.maskpls.model import MaskPLSConfig
from autoinst_tpu.models.maskpls.train import train
from autoinst_tpu.models.maskpls.evaluate import evaluate


@pytest.fixture(scope="module")
def chunk_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("chunks")
    d = root / "0"
    d.mkdir()
    rng = np.random.default_rng(0)
    for f in range(2):
        pts, ins = [], []
        for i in range(3):
            c = np.array([i * 3.0, f * 1.0, 0])
            pts.append(c + rng.normal(scale=0.4, size=(180, 3)))
            ins.append(np.full(180, i + 1, np.int32))
        xyz = np.concatenate(pts)
        labels = np.concatenate(ins)
        np.savez(d / f"{f:06d}.npz", pts=xyz, ncut_labels=labels,
                 kitti_labels=labels,
                 cluster_labels=np.zeros_like(labels),
                 semantic=np.zeros_like(labels))
    return str(root)


@pytest.mark.slow
def test_train_checkpoint_resume_evaluate(chunk_dir, tmp_path):
    cfg = MaskPLSConfig(num_queries=8, num_points=128, n_mask_pts=16,
                        batch_acc=1, lr=1e-3)
    ckpt_dir = str(tmp_path / "ckpts")
    state = train(chunk_dir, epochs=1, ckpt_dir=ckpt_dir, cfg=cfg,
                  v0=1024, n_points=640, t_max=8, min_points=50,
                  limit_steps=2)
    last = os.path.join(ckpt_dir, "maskpls_last.ckpt")
    assert os.path.exists(last)
    log = [json.loads(l) for l in open(os.path.join(ckpt_dir,
                                                    "train_log.jsonl"))]
    assert log and log[0]["loss"] is not None

    # resume continues from the stored step
    state2 = train(chunk_dir, epochs=1, ckpt_dir=ckpt_dir, cfg=cfg,
                   v0=1024, n_points=640, t_max=8, min_points=50,
                   resume=last, limit_steps=3)
    assert int(state2.step) >= int(state.step)

    out = evaluate(chunk_dir, last, cfg=cfg, v0=1024, n_points=640,
                   t_max=8, results_dir=str(tmp_path / "preds"), limit=1)
    assert "PQ" in out
    preds = os.listdir(tmp_path / "preds")
    assert preds and preds[0].endswith(".label")
    raw = np.fromfile(tmp_path / "preds" / preds[0], np.uint32)
    assert len(raw) > 0


@pytest.mark.slow
def test_total_horizon_resume_skips_done_epochs(chunk_dir, tmp_path):
    """Wipe-recovery contract: rerunning train() with the SAME total
    horizon from a mid-run checkpoint continues to the original endpoint
    (here: 2 chunks x 3 epochs = 6 steps) instead of extending it."""
    cfg = MaskPLSConfig(num_queries=8, num_points=128, n_mask_pts=16,
                        batch_acc=1, lr=1e-3)
    ckpt_dir = str(tmp_path / "ckpts")
    # interrupted run: 2 of 3 epochs done (epoch ckpts every epoch)
    train(chunk_dir, epochs=2, ckpt_dir=ckpt_dir, cfg=cfg,
          v0=1024, n_points=640, t_max=8, min_points=50, total_horizon=True)
    ep1 = os.path.join(ckpt_dir, "maskpls_epoch001.ckpt")
    assert os.path.exists(ep1)
    # relaunch with the full 3-epoch horizon from the epoch-1 checkpoint
    state = train(chunk_dir, epochs=3, ckpt_dir=ckpt_dir, cfg=cfg,
                  v0=1024, n_points=640, t_max=8, min_points=50,
                  resume=ep1, total_horizon=True)
    assert int(state.step) == 6  # 4 resumed + one more epoch, not 4 + 6
    # a second rerun from the finished state is a no-op horizon-wise
    state2 = train(chunk_dir, epochs=3, ckpt_dir=ckpt_dir, cfg=cfg,
                   v0=1024, n_points=640, t_max=8, min_points=50,
                   resume=os.path.join(ckpt_dir, "maskpls_last.ckpt"),
                   total_horizon=True)
    assert int(state2.step) == 6
