#!/usr/bin/env python
"""Minimal CPU overfit probe for the MaskPLS trainer (VERDICT r3 #3).

One tiny scene (3 instances, ~600 points), 400 train steps, then panoptic
inference and per-GT-mask best IoU. A healthy trainer must memorize this in
minutes -- it is the gate to run BEFORE burning hours of TPU time on a full
self-training run.

Round-4 findings (NOTES_ROUND4.md):
  --no-schedule (constant LR, reference-parity AdamW): reaches dice ~0 but
    oscillates and repeatedly LOSES memorized masks to Hungarian assignment
    flips; a final mask can end at IoU 0.
  default (warmup+cosine): dice 0.026 by step 50, settles, all masks IoU 1.0.

Usage: python scripts/overfit_probe.py [--no-schedule] [--steps 400]
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--no-schedule", action="store_true",
                    help="constant LR (reference-parity optimizer)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from autoinst_tpu.models.maskpls.model import (
        MaskPLSConfig, create_train_state, train_step, panoptic_inference)
    from test_maskpls import tiny_batch

    batch, targets = tiny_batch()
    batch = jax.tree.map(jnp.asarray, batch)
    targets = jax.tree.map(jnp.asarray, targets)
    cfg = MaskPLSConfig(
        num_queries=8, num_points=256, n_mask_pts=32, lr=args.lr,
        batch_acc=1, eos_coef=0.1,
        lr_warmup=0 if args.no_schedule else 20,
        lr_total_steps=0 if args.no_schedule else args.steps)
    state = create_train_state(jax.random.PRNGKey(0), cfg, batch)
    for step in range(args.steps):
        state, total, parts = train_step(state, batch, targets,
                                         jax.random.PRNGKey(step), cfg)
        if step % 50 == 0 or step == args.steps - 1:
            print(step, "total", round(float(total), 2),
                  "dice", round(float(parts["loss_dice"]), 3),
                  "mask", round(float(parts["loss_mask"]), 3),
                  "ce", round(float(parts["loss_ce"]), 3),
                  "gnorm", round(float(parts["grad_norm"]), 1), flush=True)

    out, _, _ = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch, train=False)
    logits = np.asarray(out["pred_logits"][0])
    masks = np.asarray(out["pred_masks"][0])
    pv = np.asarray(batch["pt_valid"][0])
    sem, ins, confs = panoptic_inference(logits, masks, pv)
    gt = np.asarray(targets["masks"][0])
    valid_t = np.asarray(targets["valid"][0])
    n = int(pv.sum())
    print("pred instances:", np.unique(ins))
    worst = 1.0
    for t in range(gt.shape[0]):
        if not valid_t[t]:
            continue
        g = gt[t, :n] > 0.5
        best = max((((g & (ins == u)).sum() / max((g | (ins == u)).sum(), 1))
                    for u in np.unique(ins) if u != 0), default=0.0)
        worst = min(worst, best)
        print("gt mask", t, "pts", int(g.sum()), "best IoU", round(best, 3))
    print("PROBE", "PASS" if worst >= 0.9 else "FAIL",
          f"(worst mask IoU {worst:.3f})")


if __name__ == "__main__":
    main()
