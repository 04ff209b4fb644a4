#!/usr/bin/env python
"""Evaluate a trained MaskPLS checkpoint on held-out synthetic chunks:
refiner forward -> panoptic instances -> P/R/F1 + AP + S_assoc vs the
chunk's ground-truth instance labels (the full self-training quality loop
on real hardware).

Usage: python scripts/e2e_selftrain_eval.py --weights <msgpack> \
    --chunks /tmp/e2e_chunks/seq00/chunk_6.npz [chunk_7.npz ...] \
    [--v0 32768] [--n-points 30720] [--queries 40]
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--chunks", nargs="+", required=True)
    ap.add_argument("--v0", type=int, default=32768)
    ap.add_argument("--n-points", type=int, default=30720)
    ap.add_argument("--queries", type=int, default=40)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--level-widths", default="",
                    help="comma-separated uniform level widths (use the "
                         "training run's, so every chunk shares one "
                         "compiled forward)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    log("devices:", jax.devices())

    from autoinst_tpu.models.maskpls.model import MaskPLSConfig
    from autoinst_tpu.models.maskpls.refiner import RefinerModel
    from autoinst_tpu.metrics.instance_metrics import InstanceMetrics
    from autoinst_tpu.utils.pointcloud import PointCloud

    cfg = MaskPLSConfig(num_queries=args.queries,
                        compute_dtype=args.dtype)
    widths = ([int(w) for w in args.level_widths.split(",")]
              if args.level_widths else None)
    refiner = RefinerModel(weights_path=args.weights, cfg=cfg, v0=args.v0,
                           n_points=args.n_points, level_widths=widths)
    metrics = InstanceMetrics(name="e2e_selftrain", min_points=100,
                      out_dir="/tmp/e2e_results/")

    for path in args.chunks:
        with np.load(path) as d:
            pts = d["pts"].astype(np.float64)
            gt = d["ncut_labels"].astype(np.int32)
        pcd = PointCloud(pts - pts.mean(0))
        out = refiner.forward_and_project(pcd)
        # colors -> instance ids via unique rows (pipeline contract)
        cols = np.asarray(out.colors)
        _, inst = np.unique(cols, axis=0, return_inverse=True)
        inst = inst.astype(np.int32)
        # background (black) stays an instance id; metrics filter by size
        try:
            metrics.update_stats(inst, inst, gt)
        except ZeroDivisionError:
            # faithful reference metrics divide by pred count; an untrained
            # model can predict zero surviving instances
            log(f"{os.path.basename(path)}: no predictions above "
                f"min_points; skipping map")
            continue
        log(f"{os.path.basename(path)}: "
            f"pred_instances={len(np.unique(inst))} "
            f"gt_instances={len(np.unique(gt))}")

    summary = metrics.sequence_stats()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
