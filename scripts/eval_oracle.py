#!/usr/bin/env python
"""Refined-eval-path ceiling experiment: run the MaskPLS-refined pipeline
with an ORACLE refiner whose per-chunk predictions are the GT instance
labels (exact 1-NN against the preprocessed GT map). The score isolates
the eval half of the self-training loop (downsample -> color -> 1-NN
reprojection -> chunk merge -> confidence contract -> metrics): a low
oracle score means the merge/eval path caps the refined branch no matter
how well the model trains; a high score means model quality is the only
blocker.

Usage: python scripts/eval_oracle.py [--work .selftrain] [--tag oracle]
"""

import argparse
import json
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default=os.path.join(REPO, ".selftrain"))
    ap.add_argument("--cache-from", default="out_export24")
    ap.add_argument("--tag", default="oracle")
    ap.add_argument("--n-points", type=int, default=30720,
                    help="mirror the real refiner's downsample so the "
                         "comparison isolates the path, not the density")
    ap.add_argument("--source", choices=["gt", "pseudo"], default="gt",
                    help="gt: GT instance labels (eval-path ceiling); "
                         "pseudo: nearest overlap-24 train chunk's NCuts "
                         "labels (what PERFECT pseudo-label memorization "
                         "would score at eval)")
    ap.add_argument("--train-chunks", default="out_export24/train/0")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    out_name = f"out_refined_{args.tag}"
    out_dir = os.path.join(args.work, out_name)
    os.makedirs(out_dir, exist_ok=True)
    src = os.path.join(args.work, args.cache_from)
    for f in os.listdir(src):
        p = os.path.join(src, f)
        if os.path.isfile(p) and not os.path.exists(os.path.join(out_dir, f)):
            shutil.copy(p, out_dir)

    from scipy.spatial import cKDTree
    from autoinst_tpu.models.maskpls import refiner as refiner_mod
    from autoinst_tpu.utils.pcd_io import read_pcd_file
    from autoinst_tpu.utils.pointcloud import PointCloud

    if args.source == "gt":
        ng = read_pcd_file(os.path.join(out_dir,
                                        "pcd_nonground_minor0_0.pcd"))
        g = read_pcd_file(os.path.join(out_dir, "pcd_ground_minor0_0.pcd"))
        with np.load(os.path.join(out_dir,
                                  "kitti_labels_preprocessed0_0.npz")) as d:
            labels = np.hstack((d["instance_nonground"].reshape(-1),
                                d["instance_ground"].reshape(-1)))
        pts = np.vstack((np.asarray(ng.points), np.asarray(g.points)))
        sources = [(cKDTree(pts), labels.astype(np.int64), None)]
    else:
        import glob
        sources = []
        for p in sorted(glob.glob(os.path.join(
                args.work, args.train_chunks, "*.npz"))):
            with np.load(p) as d:
                cp = d["pts"][:, :3].astype(np.float64)
                sources.append((cKDTree(cp),
                                d["ncut_labels"].astype(np.int64),
                                cp.mean(axis=0)))
        print(f"pseudo source: {len(sources)} train chunks", flush=True)

    def lookup(minor):
        if len(sources) == 1:
            tree, labels, _ = sources[0]
        else:
            c = minor.mean(axis=0)
            tree, labels, _ = min(
                sources, key=lambda s: float(np.sum((s[2] - c) ** 2)))
        _, idx = tree.query(minor, workers=-1)
        return labels[idx]

    real = refiner_mod.RefinerModel

    class OracleRefiner(real):
        def __init__(self, *a, **kw):
            self.confs_dict = {}
            self.n_points = args.n_points

        def forward_point_cloud(self, pcd_full):
            target = min(60000, self.n_points)
            minor = self._downsample(np.asarray(pcd_full.points), target)
            ins = lookup(minor)
            return ins, PointCloud(minor), np.ones(len(minor), np.float32)

    refiner_mod.RefinerModel = OracleRefiner
    try:
        from autoinst_tpu.pipeline.config import config_maskpls_tarl_spatial
        from autoinst_tpu.pipeline.run_pipeline import run
        from selftrain_demo import _base_cfg
        cfg, factory = _base_cfg(args.work, out_name,
                                 maskpls_weights="oracle")
        cfg.config = dict(config_maskpls_tarl_spatial)
        cfg.overlap = 3
        results = run(cfg, dataset_factory=factory)
    finally:
        refiner_mod.RefinerModel = real
    stats = results[0]["sequence"]
    path = os.path.join(args.work, f"refined_{args.tag}.json")
    with open(path, "w") as fh:
        json.dump(stats, fh)
    print("oracle refined:", stats, flush=True)
    base_path = os.path.join(REPO, "results", "selftrain_demo",
                             "ncuts_baseline.json")
    with open(base_path) as fh:
        base = json.load(fh)
    print("delta vs ncuts:", {k: round(stats[k] - base[k], 4)
                              for k in ("p", "r", "f1", "ap", "S_assoc")},
          flush=True)


if __name__ == "__main__":
    main()
