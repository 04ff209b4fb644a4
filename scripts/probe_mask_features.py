#!/usr/bin/env python
"""Separability probe: can the trained model's OWN mask-feature space
linearly represent every pseudo-GT mask?

The decoder predicts mask logits as <mask_embed(query), mask_features[p]>
(decoder.py pred_heads), i.e. every achievable mask is a LINEAR readout of
mask_features = Dense(feats_finest) + PE(coords). Fitting an oracle
logistic readout per GT mask on those features therefore upper-bounds what
ANY query could produce. High oracle IoU on masks the model fails to
predict => the backbone/features are fine and the failure is in the
query/assignment dynamics (matching churn, masked-attention trap, BCE
class imbalance). Low oracle IoU => a representational ceiling (backbone
receptive field / resolution / feature collapse).

Usage: python scripts/probe_mask_features.py CKPT --data DIR [--n 2]
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fit_logistic(x, y, iters=300, lr=1.0):
    """Simple full-batch logistic regression with per-class balancing."""
    n, d = x.shape
    w = np.zeros(d, np.float64)
    b = 0.0
    pos = max(y.sum(), 1)
    # balance: weight positives so both classes contribute equally
    sw = np.where(y > 0, n / (2.0 * pos), n / (2.0 * max(n - pos, 1)))
    sw /= sw.mean()
    for _ in range(iters):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        g = (p - y) * sw / n
        w -= lr * (x.T @ g)
        b -= lr * g.sum()
    z = x @ w + b
    return z > 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--data", default=".selftrain/out_merged24/train")
    ap.add_argument("--n", type=int, default=2)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from flax import serialization
    from autoinst_tpu.models.maskpls.model import MaskPS, MaskPLSConfig
    from autoinst_tpu.models.maskpls.pseudo_dataset import (PseudoDataset,
                                                            collate)

    cfg = MaskPLSConfig(num_queries=40)
    model = MaskPS(cfg)

    ds = PseudoDataset(args.data, subsample=True, sub_pts=30000, aug=False)
    widths_file = os.path.join(os.path.dirname(args.ckpt),
                               "level_widths.json")
    level_widths = None
    if os.path.exists(widths_file):
        with open(widths_file) as fh:
            level_widths = json.load(fh)

    with open(args.ckpt, "rb") as fh:
        raw = serialization.msgpack_restore(fh.read())
    variables = {"params": raw["params"], "batch_stats": raw["batch_stats"]}

    step = max(len(ds) // args.n, 1)
    for idx in list(range(len(ds)))[::step][:args.n]:
        item = ds[idx]
        batch, targets = collate([item], cfg.resolution, 32768, 30720, 40,
                                 level_widths=level_widths)
        out, inter = model.apply(
            variables, batch, train=True,
            mutable=["batch_stats", "intermediates"],
            capture_intermediates=True)
        outputs, pad_masks, _ = out
        inters = inter["intermediates"]
        dec = inters["decoder"]
        proj = np.asarray(dec["mask_feat_proj"]["__call__"][0][0])  # [P, 256]
        pe = np.asarray(
            dec["PositionalEncoder_0"]["__call__"][0][0])           # [P, 256]
        mask_features = proj + pe
        nvalid = int(np.asarray(batch["pt_valid"][0]).sum())
        x = mask_features[:nvalid].astype(np.float64)
        x /= max(np.abs(x).std(), 1e-6)

        tmask = np.asarray(targets["masks"][0])[:, :nvalid]
        tvalid = np.asarray(targets["valid"][0])
        pred_masks = np.asarray(outputs["pred_masks"][0])[:nvalid]  # [P, Q]

        print(f"\nchunk {os.path.basename(item['fname'])}: {nvalid} pts, "
              f"{int(tvalid.sum())} GT masks")
        rows = []
        for t in range(int(tvalid.sum())):
            y = tmask[t] > 0.5
            size = int(y.sum())
            pred = fit_logistic(x, y.astype(np.float64))
            inter_ = (pred & y).sum()
            iou_probe = inter_ / max((pred | y).sum(), 1)
            # best IoU any current query achieves at sigmoid>=0.5
            best_q = 0.0
            for q in range(pred_masks.shape[1]):
                pm = pred_masks[:, q] > 0
                ii = (pm & y).sum()
                if ii:
                    best_q = max(best_q, ii / (pm | y).sum())
            rows.append((size, iou_probe, best_q))
        rows.sort(reverse=True)
        print("  size  probe-IoU  best-query-IoU")
        for size, pi, bq in rows:
            flag = "  <-- repr OK, queries fail" if pi > 0.75 > bq else ""
            print(f"  {size:6d}   {pi:.2f}       {bq:.2f}{flag}")


if __name__ == "__main__":
    main()
