#!/usr/bin/env python
"""Real-scale overfit A/B for the matching stabilizers.

Trains on 2 REAL merged-relabel chunks (subsampled point budget so a CPU
step is fast) and compares matching configurations head-to-head. The
round-4 probes showed mask features separate every target (probe IoU
0.9-1.0) while queries own only the biggest masks and the class head stays
at chance -- implicating Hungarian-assignment churn. A fix must show, at
REAL target statistics (one giant ground mask + mid + tiny masks):

  * CE falling well below the ~0.49/mask chance plateau,
  * every GT mask owned by some query (best-IoU ~1 on a memorization run),
  * assignments stable over the last quarter of training.

Usage: python scripts/probe_overfit_scale.py [--mode base|exact|joint]
           [--steps 250] [--data DIR]
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="joint",
                    choices=["base", "exact", "joint"])
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--data", default=".selftrain/out_merged24/train")
    ap.add_argument("--sub", type=int, default=8000)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real TPU (a CPU step at 8k points is "
                         "~20 s on the 1-core host; the TPU amortizes its "
                         "compile within ~30 steps)")
    args = ap.parse_args()

    import jax
    if args.tpu:
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                              os.path.join(REPO, ".jax_cache"))
    else:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from autoinst_tpu.models.maskpls import model as M
    from autoinst_tpu.models.maskpls.pseudo_dataset import (PseudoDataset,
                                                            collate)

    n_points = ((args.sub + 1023) // 1024) * 1024
    cfg = M.MaskPLSConfig(
        num_queries=40, num_points=n_points, lr=args.lr, batch_acc=1,
        eos_coef=0.1, lr_warmup=20, lr_total_steps=args.steps,
        match_exact=args.mode in ("exact", "joint"),
        match_joint=args.mode == "joint")

    ds = PseudoDataset(args.data, subsample=True, sub_pts=args.sub,
                       aug=False, min_points=30)
    items = [ds[i] for i in range(0, args.chunks * 8, 8)]
    # uniform static widths across the probe's chunks -> ONE compiled step
    # (mirrors train.py's dataset_level_widths contract)
    from autoinst_tpu.models.maskpls.sparse import (plan_level_counts,
                                                    quantize_points,
                                                    level_budget)
    max_counts = [0] * 5
    for it in items:
        q = quantize_points(it["xyz"], cfg.resolution)
        for lvl, c in enumerate(plan_level_counts(q, 5)):
            max_counts[lvl] = max(max_counts[lvl], c)
    widths = [level_budget(8192 >> lvl, int(c * 1.05) + 64)
              for lvl, c in enumerate(max_counts)]
    batches = [collate([it], cfg.resolution, 8192, n_points, 40,
                       level_widths=widths)
               for it in items]
    batches = [(jax.tree.map(jnp.asarray, b), jax.tree.map(jnp.asarray, t))
               for b, t in batches]

    state = M.create_train_state(jax.random.PRNGKey(0), cfg, batches[0][0])

    print(f"mode={args.mode} chunks={len(batches)} pts={args.sub} "
          f"steps={args.steps}")
    for i, (_, t) in enumerate(batches):
        sizes = np.asarray(t["masks"][0]).sum(1).astype(int)
        nt = int(np.asarray(t["valid"][0]).sum())
        print(f"  chunk {i}: {nt} masks, sizes {sorted(sizes[:nt])[::-1]}")

    for step in range(args.steps):
        b, t = batches[step % len(batches)]
        state, total, parts = M.train_step(state, b, t,
                                           jax.random.PRNGKey(step), cfg)
        if step % 25 == 0 or step == args.steps - 1:
            print(f"step {step}: total {float(total):7.2f} "
                  f"ce {float(parts['loss_ce']):.3f} "
                  f"dice {float(parts['loss_dice']):.3f} "
                  f"mask {float(parts['loss_mask']):.3f}", flush=True)

    # final ownership: per-GT-mask best query IoU (sigmoid >= 0.5) and the
    # panoptic assembly's instance count
    for i, (b, t) in enumerate(batches):
        out, _ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            b, train=True, mutable=["batch_stats"])
        outputs = out[0]
        pv = np.asarray(b["pt_valid"][0]).astype(bool)
        pm = np.asarray(outputs["pred_masks"][0])[pv]     # [Pv, Q]
        tm = np.asarray(t["masks"][0])[:, pv]
        nt = int(np.asarray(t["valid"][0]).sum())
        ious = []
        for k in range(nt):
            y = tm[k] > 0.5
            best = 0.0
            for q in range(pm.shape[1]):
                p = pm[:, q] > 0
                ii = (p & y).sum()
                if ii:
                    best = max(best, ii / (p | y).sum())
            ious.append(round(float(best), 2))
        sem, ins, confs = M.panoptic_inference(
            np.asarray(outputs["pred_logits"][0]), np.asarray(
                outputs["pred_masks"][0]), pv)
        print(f"chunk {i}: best-query IoU per mask "
              f"{sorted(ious, reverse=True)}")
        print(f"         assembled instances {len(np.unique(ins[ins > 0]))}"
              f" (GT {nt}), top confs "
              f"{np.round(np.sort(confs)[::-1][:6], 2).tolist()}")
    print(json.dumps({"mode": args.mode,
                      "final_ce": float(parts["loss_ce"]),
                      "min_iou": min(ious), "mean_iou": float(np.mean(ious))}))


if __name__ == "__main__":
    main()
