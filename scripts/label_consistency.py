#!/usr/bin/env python
"""Measure cross-chunk pseudo-label consistency in an overlap export.

For every pair of overlapping training chunks, match shared points exactly
(same map -> identical coordinates) and score pairwise same-instance
agreement (Rand-style) on object points. High disagreement means the
training set supervises the SAME physical points with contradictory
instance partitions -- the minimizer of a dice/BCE loss under contradiction
is a soft/blurry mask, which the panoptic 0.8 overlap rule then drops.

Usage: python scripts/label_consistency.py --data .selftrain/out_export24/train/0
"""

import argparse
import glob
import os
import sys

import numpy as np
from scipy.spatial import cKDTree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def pair_agreement(la, lb, n_samples=20000, rng=None):
    """Rand-style agreement over sampled point pairs, object points only
    (label >= 0 in BOTH labelings; ground/unassigned excluded)."""
    ok = (la >= 0) & (lb >= 0)
    la, lb = la[ok], lb[ok]
    if len(la) < 10:
        return None, 0
    rng = rng or np.random.default_rng(0)
    i = rng.integers(0, len(la), n_samples)
    j = rng.integers(0, len(la), n_samples)
    keep = i != j
    i, j = i[keep], j[keep]
    same_a = la[i] == la[j]
    same_b = lb[i] == lb[j]
    # condition on "same in at least one" -- unconditional agreement is
    # dominated by easy negatives (different far-apart objects)
    rel = same_a | same_b
    if rel.sum() == 0:
        return None, len(la)
    return float((same_a & same_b)[rel].mean()), int(len(la))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=".selftrain/out_export24/train/0")
    ap.add_argument("--max-pairs", type=int, default=60)
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(args.data, "*.npz")))
    chunks = []
    for p in files:
        with np.load(p) as d:
            pts = d["pts"][:, :3].astype(np.float64)
            chunks.append((os.path.basename(p), pts,
                           d["ncut_labels"].astype(np.int64)))
    print(f"{len(chunks)} chunks", flush=True)

    rng = np.random.default_rng(0)
    scores = []
    n_pairs = 0
    for a in range(len(chunks)):
        for b in range(a + 1, len(chunks)):
            if n_pairs >= args.max_pairs:
                break
            na, pa, la = chunks[a]
            nb, pb, lb = chunks[b]
            # bounding-box overlap gate
            lo = np.maximum(pa.min(0), pb.min(0))
            hi = np.minimum(pa.max(0), pb.max(0))
            if np.any((hi - lo)[:2] < 5.0):   # x/y overlap only (z is flat)
                continue
            tree = cKDTree(pb)
            dist, idx = tree.query(pa, workers=-1,
                                   distance_upper_bound=1e-6)
            shared = np.isfinite(dist)
            if shared.sum() < 500:
                continue
            agree, n_obj = pair_agreement(la[shared], lb[idx[shared]],
                                          rng=rng)
            if agree is None:
                continue
            n_pairs += 1
            scores.append(agree)
            print(f"{na} x {nb}: shared={int(shared.sum())} "
                  f"obj={n_obj} same-instance agreement={agree:.3f}",
                  flush=True)
    if scores:
        print(f"\nmean agreement over {len(scores)} overlapping pairs: "
              f"{np.mean(scores):.3f}  (1.0 = fully consistent labels; "
              f"the dice-loss target is exactly this consistent)")


if __name__ == "__main__":
    main()
