#!/usr/bin/env python
"""Minimal repro driver: repeated MaskPLS train_step calls on the real TPU.

The train CLI dies with a generic axon "TPU backend error (InvalidArgument)"
on the 3rd step. This drives N steps on ONE fixed batch with immediate
per-step logging, with knobs to bisect: advancing vs frozen state,
grid vs exact knn, reusing the CLI's shapes.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--freeze-state", action="store_true")
    ap.add_argument("--knn-mode", default="grid")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mode", default="fixed",
                    choices=["fixed", "alternate", "fresh", "aabb"])
    ap.add_argument("--data", default="/tmp/verify_knn/chunks")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    log("devices:", jax.devices())

    from autoinst_tpu.models.maskpls.model import (MaskPLSConfig,
                                                   create_train_state,
                                                   train_step)
    from autoinst_tpu.models.maskpls.pseudo_dataset import (PseudoDataset,
                                                            collate)

    cfg = MaskPLSConfig(knn_mode=args.knn_mode)
    ds = PseudoDataset(args.data, min_points=100, sub_pts=80000,
                       subsample=True, aug=False, seed=0)

    def build(i):
        item = ds[i % len(ds)]
        batch, targets = collate([item], cfg.resolution, 2048, 2048, 40)
        for lvl_i, lv in enumerate(batch["levels"]):
            log(f"  item {i} level {lvl_i}: V={lv['nbr3'].shape[1]}")
        return (jax.tree.map(jnp.asarray, batch),
                jax.tree.map(jnp.asarray, targets))

    if args.mode == "fixed":
        batches = [build(0)]
    elif args.mode == "alternate":
        batches = [build(i) for i in range(min(len(ds), 2))]
    elif args.mode == "aabb":
        a, b = build(0), build(1)
        batches = [a, a, b, b, a, a, b, b]
    else:  # fresh: re-collate + re-upload every step
        batches = None
    log("batches built" if batches else "fresh mode")

    b0 = batches[0] if batches else build(0)
    state = create_train_state(jax.random.PRNGKey(0), cfg, b0[0])
    log("state created")
    rng = jax.random.PRNGKey(1)
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        if batches is not None:
            batch, targets = batches[i % len(batches)]
        else:
            batch, targets = build(i)
        t0 = time.perf_counter()
        new_state, total, parts = train_step(state, batch, targets, sub, cfg)
        loss = float(total)
        dt = time.perf_counter() - t0
        log(f"step {i}: loss={loss:.4f} t={dt:.2f}s")
        if not args.freeze_state:
            state = new_state
    log("DONE")


if __name__ == "__main__":
    main()
