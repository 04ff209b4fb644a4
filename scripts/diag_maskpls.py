#!/usr/bin/env python
"""Diagnose a MaskPLS checkpoint on its own training chunks: surviving
queries, fraction of points assigned, per-pseudo-GT-mask best IoU.
(Recreates the round-2 /tmp/diag_maskpls.py workflow.)

Usage: python scripts/diag_maskpls.py CKPT_DIR/maskpls_epochNNN.ckpt \
          --data .selftrain/out_export24/train [--n 3]
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--data", default=".selftrain/out_export24/train")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--conf", type=float, default=0.5)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from flax import serialization
    from autoinst_tpu.models.maskpls.model import MaskPLSConfig
    from autoinst_tpu.models.maskpls.refiner import RefinerModel

    widths_file = os.path.join(os.path.dirname(args.ckpt),
                               "level_widths.json")
    kwargs = {"cfg": MaskPLSConfig(num_queries=40), "v0": 32768,
              "n_points": 30720}
    if os.path.exists(widths_file):
        with open(widths_file) as fh:
            kwargs["level_widths"] = json.load(fh)

    weights = args.ckpt
    if not weights.endswith(".msgpack"):
        with open(weights, "rb") as fh:
            raw = serialization.msgpack_restore(fh.read())
        weights = "/tmp/diag_weights.msgpack"
        with open(weights, "wb") as fh:
            fh.write(serialization.msgpack_serialize(
                {"params": raw["params"], "batch_stats": raw["batch_stats"]}))

    from autoinst_tpu.utils.pointcloud import PointCloud
    model = RefinerModel(weights_path=weights, **kwargs)
    files = sorted(glob.glob(os.path.join(args.data, "*", "*.npz"))
                   or glob.glob(os.path.join(args.data, "*.npz")))
    step = max(len(files) // args.n, 1)
    for path in files[::step][:args.n]:
        d = np.load(path)
        pts = d["pts"][:, :3].astype(np.float32)
        gt = d["ncut_labels"].astype(np.int64)
        labels, minor, confs = model.forward_point_cloud(PointCloud(pts))
        labels = np.asarray(labels)
        idx = np.arange(0, len(pts), max(-(-len(pts) // min(
            60000, model.n_points)), 1))
        gt = gt[idx]
        assigned = labels >= 0
        uniq = np.unique(labels[assigned])
        print(f"\n{os.path.basename(path)}: {len(pts)} pts, "
              f"{len(np.unique(gt[gt >= 0]))} pseudo-GT masks")
        print(f"  predicted instances: {len(uniq)}  "
              f"assigned: {assigned.mean():.2%}  confs: "
              f"{[round(float(c), 2) for c in np.sort(confs)[::-1][:8]]}")
        ious = []
        for g in np.unique(gt[gt >= 0]):
            m = gt == g
            if m.sum() < 50:
                continue
            best = 0.0
            for u in uniq:
                p = labels == u
                inter = (m & p).sum()
                if inter:
                    best = max(best, inter / (m | p).sum())
            ious.append(round(best, 2))
        print(f"  best-IoU per pseudo-GT mask (>=50 pts): "
              f"{sorted(ious, reverse=True)}")


if __name__ == "__main__":
    main()
