#!/usr/bin/env python
"""Assignment-stability probe: from a trained checkpoint, run N train
steps on ONE fixed batch and record the Hungarian assignment (query index
per target) at every step and every decoder level.

If small targets keep changing their matched query step-to-step (or the
final-level assignment disagrees with most aux levels), the class head
receives contradictory supervision and can never mark object queries
confidently -- the 'confidences uniform, CE at chance' signature.

Usage: python scripts/probe_assignment.py CKPT --data DIR [--steps 6]
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
    ap.add_argument("ckpt")
    ap.add_argument("--data", default=".selftrain/out_merged24/train")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--lr", type=float, default=5e-4)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax import serialization
    from autoinst_tpu.models.maskpls import model as M
    from autoinst_tpu.models.maskpls.pseudo_dataset import (PseudoDataset,
                                                            collate)

    cfg = M.MaskPLSConfig(num_queries=40, lr=args.lr, batch_acc=1,
                          eos_coef=0.1)
    ds = PseudoDataset(args.data, subsample=True, sub_pts=30000, aug=False)
    widths_file = os.path.join(os.path.dirname(args.ckpt),
                               "level_widths.json")
    level_widths = None
    if os.path.exists(widths_file):
        with open(widths_file) as fh:
            level_widths = json.load(fh)
    batch, targets = collate([ds[0]], cfg.resolution, 32768, 30720, 40,
                             level_widths=level_widths)
    batch = {k: jnp.asarray(v) if not isinstance(v, (list, dict)) else v
             for k, v in batch.items()}

    with open(args.ckpt, "rb") as fh:
        raw = serialization.msgpack_restore(fh.read())

    rng = jax.random.PRNGKey(0)
    state = M.create_train_state(rng, cfg, batch)
    state = state.replace(params=raw["params"],
                          batch_stats=raw["batch_stats"])

    tvalid = np.asarray(targets["valid"][0])
    sizes = np.asarray(targets["masks"][0]).sum(1).astype(int)
    nt = int(tvalid.sum())
    print(f"chunk 0: {nt} targets, sizes {sizes[:nt].tolist()}")

    # instrument: recompute costs/assign outside the step for telemetry
    def assignments(params, stats, key):
        out, _ = state.apply_fn({"params": params, "batch_stats": stats},
                                batch, train=True, mutable=["batch_stats"])
        outputs = out[0]
        levels = [outputs] + list(outputs.get("aux_outputs", []))
        k_match, _ = jax.random.split(key)
        costs = jnp.stack([
            M.matching_costs(lvl, targets, jax.random.fold_in(k_match, i),
                             cfg) for i, lvl in enumerate(levels)])
        return M.hungarian_match(costs)  # [L, B, T]

    hist = []
    for step in range(args.steps):
        key = jax.random.fold_in(jax.random.PRNGKey(7), step)
        a = np.asarray(assignments(state.params, state.batch_stats, key))
        hist.append(a[:, 0, :nt])  # [L, nt]
        lvl_agree = (a[:, 0, :nt] == a[0:1, 0, :nt]).mean(0)
        print(f"step {step}: final-level assign {a[0, 0, :nt].tolist()}")
        print(f"         cross-level agreement w/ final "
              f"{np.round(lvl_agree, 2).tolist()}")
        state, total, parts = M.train_step(state, batch, targets, key, cfg)
        print(f"         loss {float(total):.3f} "
              f"dice {float(parts['loss_dice']):.3f}")

    hist = np.stack(hist)  # [S, L, nt]
    stable = (hist[:, 0, :] == hist[0, 0, :]).mean(0)
    print("\nper-target final-level stability across steps "
          f"(1.0 = never flips): {np.round(stable, 2).tolist()}")
    print(f"target sizes:          {sizes[:nt].tolist()}")


if __name__ == "__main__":
    main()
