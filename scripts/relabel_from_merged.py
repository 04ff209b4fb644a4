#!/usr/bin/env python
"""Relabel self-training chunks from a merged-map prediction.

The dense overlap-24 export labels every training chunk with an
INDEPENDENT NCuts run, so overlapping chunks contradict each other and the
mask loss's minimizer is a blurry mask (see pipeline/label_fusion.py).
Round-3 measurement: the kNN co-association fusion fixes consistency but
degrades label quality (pipeline pseudo-oracle ap 0.27 vs the raw-label
0.367) -- the eval-side chunk merge (pipeline/merging.py, the reference's
merge_chunks_unite_instances semantics) is a strictly better fusion
algorithm than co-association voting on this data.

So use the pipeline's own merged map AS the fused labeling: 1-NN transfer
the merged prediction's instance ids onto every training chunk.  Targets
become globally consistent (one labeling for the whole map) while keeping
the merge path's quality (pseudo-oracle ceiling ~= the committed
pseudo_oracle_ceiling.json).  This mirrors what the reference's scale
achieves implicitly -- training on enough data that the network averages
out per-chunk contradictions (reference README.md:100) -- made explicit
for a small map.

Usage:
  python scripts/relabel_from_merged.py \
      --merged .selftrain/out_refined_pseudoracle/0/maskpls_tarl_spatial_0_0.pcd \
      --train .selftrain/out_export24/train/0 --out .selftrain/out_merged24/train/0
"""

import argparse
import glob
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--merged", required=True,
                    help="merged prediction .pcd (colors encode instances)")
    ap.add_argument("--train", default=".selftrain/out_export24/train/0")
    ap.add_argument("--out", default=".selftrain/out_merged24/train/0")
    args = ap.parse_args()

    from scipy.spatial import cKDTree

    from autoinst_tpu.utils.pcd_io import read_pcd_file

    merged = read_pcd_file(args.merged)
    pts = np.asarray(merged.points)
    _, labels = np.unique(np.asarray(merged.colors), axis=0,
                          return_inverse=True)
    tree = cKDTree(pts)
    print(f"merged map: {len(pts)} pts, {labels.max() + 1} instances",
          flush=True)

    files = sorted(glob.glob(os.path.join(args.train, "*.npz")))
    if not files:
        raise FileNotFoundError(f"no npz chunks under {args.train}")
    os.makedirs(args.out, exist_ok=True)
    per_chunk = []
    for p in files:
        with np.load(p) as d:
            payload = {k: d[k] for k in d.files}
        dist, idx = tree.query(payload["pts"][:, :3], workers=-1)
        lab = labels[idx]
        # compact per-chunk ids (the trainer one-hots against t_max)
        _, lab = np.unique(lab, return_inverse=True)
        payload["ncut_labels"] = lab.astype(np.int64)
        np.savez_compressed(os.path.join(args.out, os.path.basename(p)),
                            **payload)
        per_chunk.append(lab.max() + 1)
    print(f"relabeled {len(files)} chunks -> {args.out}; instances/chunk "
          f"min={min(per_chunk)} max={max(per_chunk)}", flush=True)


if __name__ == "__main__":
    main()
