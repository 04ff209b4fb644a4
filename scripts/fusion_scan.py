#!/usr/bin/env python
"""Scan pseudo-label fusion variants, scoring each at MAP level vs GT.

Cheap (seconds per variant, no pipeline run) selector for the labeling the
self-training demo should train on: the trained model's eval score is
bounded by its training targets' agreement with GT (pseudo-oracle), so the
map-level number ranks variants before an expensive train+eval cycle.

Usage: python scripts/fusion_scan.py [--data DIR]
"""

import argparse
import glob
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def score(name, fused, gt, min_points=200):
    from autoinst_tpu.metrics.instance_metrics import InstanceMetrics
    # ground convention: largest fused component -> background 0
    ids, counts = np.unique(fused, return_counts=True)
    remap = {int(i): k + 1 for k, i in enumerate(ids)}
    remap[int(ids[np.argmax(counts)])] = 0
    pred = np.array([remap[int(i)] for i in ids])[
        np.searchsorted(ids, fused)]
    m = InstanceMetrics(name, min_points=min_points)
    m.update_stats(pred.copy(), pred.copy(), gt.astype(np.int64))
    stats = {k: float(v[0]) for k, v in m.sequence_metrics.items()}
    print(f"{name:24s} " + "  ".join(
        f"{k}={stats[k]:.3f}" for k in ("p", "r", "f1", "ap", "S_assoc")),
        flush=True)
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=".selftrain/out_export24/train/0")
    ap.add_argument("--min-size", type=int, default=200)
    args = ap.parse_args()

    from autoinst_tpu.pipeline.label_fusion import (absorb_fragments,
                                                    chunk_owners,
                                                    fuse_labels, knn_edges,
                                                    register_points)

    files = sorted(glob.glob(os.path.join(args.data, "*.npz")))
    pts_sets, lab_sets, gt_sets = [], [], []
    for p in files:
        with np.load(p) as d:
            pts_sets.append(d["pts"][:, :3].astype(np.float64))
            lab_sets.append(d["ncut_labels"].astype(np.int64))
            gt_sets.append(d["kitti_labels"].astype(np.int64))
    t = time.time()
    gids, n_global, uniq = register_points(pts_sets)
    edges = knn_edges(uniq, k=6)
    owners = chunk_owners(gids, pts_sets, n_global)
    # chunk kitti_labels are per-chunk LOCAL ids; map-level GT comes from
    # the export's preprocessed artifacts (same source eval_oracle.py uses)
    from scipy.spatial import cKDTree
    from autoinst_tpu.utils.pcd_io import read_pcd_file
    out_dir = os.path.dirname(os.path.dirname(args.data.rstrip("/")))
    ng = read_pcd_file(os.path.join(out_dir, "pcd_nonground_minor0_0.pcd"))
    g = read_pcd_file(os.path.join(out_dir, "pcd_ground_minor0_0.pcd"))
    with np.load(os.path.join(out_dir,
                              "kitti_labels_preprocessed0_0.npz")) as d:
        map_gt = np.hstack((d["instance_nonground"].reshape(-1),
                            d["instance_ground"].reshape(-1)))
    map_pts = np.vstack((np.asarray(ng.points), np.asarray(g.points)))
    _, nn = cKDTree(map_pts).query(uniq, workers=-1)
    gt = map_gt[nn].astype(np.int64)
    print(f"setup {time.time()-t:.1f}s: {n_global} pts, "
          f"{len(edges)} edges", flush=True)

    # raw nearest-chunk ownership (seams included): composite owner|label
    raw = np.full(n_global, -1, np.int64)
    for c, (gl, lab) in enumerate(zip(gids, lab_sets)):
        own = owners[gl] == c
        raw[gl[own]] = c * 10000 + lab[own]
    score("nearest-chunk-raw", raw, gt)

    for rule, use_owner, name in (
            ("majority", False, "majority"),
            ("unanimous", False, "unanimous"),
            ("majority", True, "owner-majority"),
            ("unanimous", True, "owner-unanimous")):
        t = time.time()
        fused = fuse_labels(gids, lab_sets, n_global, edges, rule=rule,
                            owners=owners if use_owner else None)
        fused = absorb_fragments(fused, edges, min_size=args.min_size)
        score(name, fused, gt)

    # ground-aware: the pipeline's own ground segmentation (Patchwork, NOT
    # GT) pins all ground to one component; only nonground points vote.
    # Motivation: per-chunk NCuts cuts ground into clusters with
    # chunk-dependent borders, so fusion shatters ground into several big
    # components -- each a false-positive "instance" at eval.
    n_ng = len(np.asarray(ng.points))
    _, nn_any = cKDTree(map_pts).query(uniq, workers=-1)
    is_ground = nn_any >= n_ng
    ng_edges = edges[~is_ground[edges[:, 0]] & ~is_ground[edges[:, 1]]]
    for rule in ("majority", "unanimous"):
        fused = fuse_labels(gids, lab_sets, n_global, ng_edges, rule=rule)
        fused = absorb_fragments(fused, ng_edges, min_size=args.min_size)
        fused[is_ground] = fused.max() + 1
        score(f"ground-aware-{rule}", fused, gt)


if __name__ == "__main__":
    main()
