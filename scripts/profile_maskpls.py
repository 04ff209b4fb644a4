#!/usr/bin/env python
"""Profile the MaskPLS train step on the real TPU, component by component.

NOTES_ROUND1.md item 5: the 30k-pt/32k-voxel/40-query train step measured
4.3 s/step (f32) and bf16 barely moved it, so the bottleneck is not the
backbone GEMMs. This script times each candidate separately (full step,
loss-fn forward, backbone-only, knn_up-only, decoder-only, mask_loss-only,
hungarian-only) so round-2 optimization targets the real cost.

Usage:
  python scripts/profile_maskpls.py [--parts full,fwd,backbone,knn,loss,match]
      [--n-points 30720] [--v0 32768] [--queries 40] [--reps 5]
      [--remat] [--dtype float32] [--trace DIR]

Each part is jitted separately against the persistent .jax_cache, so a
tunnel crash mid-run loses only the part in flight; rerun to continue.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synth_scene(seed, n_points, n_inst=30):
    rng = np.random.default_rng(seed)
    pts, ins = [], []
    total = 0
    for i in range(n_inst):
        c = rng.uniform(-11, 11, size=3) * np.array([1, 1, 0.15])
        k = int(rng.integers(30, max(n_points // n_inst, 31)))
        p = c + rng.uniform(-0.5, 0.5, size=(k, 3)) * rng.uniform(0.5, 3.0, 3)
        pts.append(p)
        ins.append(np.full(k, i + 1, np.int32))
        total += k
    k = max(n_points - total, 0)
    pts.append(rng.uniform(-12.5, 12.5, size=(k, 3)) * np.array([1, 1, 0.3]))
    ins.append(np.zeros(k, np.int32))
    xyz = np.concatenate(pts)[:n_points]
    ins = np.concatenate(ins)[:n_points]
    xyz = xyz - xyz.mean(0)
    ids, counts = np.unique(ins, return_counts=True)
    keep = ids[(counts > 100) & (ids > 0)]
    masks = np.stack([(ins == i) for i in keep]) if len(keep) else \
        np.zeros((0, len(xyz)), bool)
    return {"xyz": xyz, "feats": np.concatenate(
                [xyz, np.ones((len(xyz), 1))], 1).astype(np.float32),
            "masks": masks, "classes": np.zeros(len(keep), np.int32),
            "ins_labels": ins}


def _force(out):
    """Force completion with a real device->host fetch (block_until_ready
    alone may not round-trip on the tunneled axon transport)."""
    import jax
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf).ravel()[:1]


def timed(fn, reps, *args):
    """Mean seconds per call: `reps` queued executions + ONE final fetch
    (use reps large enough to amortize the tunnel round trip)."""
    fn_out = fn(*args)  # compile
    _force(fn_out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / reps


def main():
    import subprocess
    # Running train_step then other jits in one process trips an XLA
    # executable/buffer mismatch (and a tunneled-TPU crash loses
    # everything); with multiple parts, run each in its own subprocess.
    argv = list(sys.argv[1:])
    if "--parts" not in argv:
        argv += ["--parts", "full,fwd,fwdonly,backbone,knn,loss,match"]
    i = argv.index("--parts")
    parts = []
    for p in argv[i + 1].split(","):
        if p == "knn":  # expand: one (mode, level) per subprocess
            parts += [f"knn:{m}:{l}" for m in ("grid", "exact")
                      for l in (0, 1, 2, 3)]
        else:
            parts.append(p)
    if len(parts) > 1:
        results = {}
        for p in parts:
            sub = list(argv)
            sub[i + 1] = p
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + sub,
                capture_output=True, text=True)
            sys.stderr.write(r.stderr)
            line = (r.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                results.update(json.loads(line))
            except json.JSONDecodeError:
                log(f"part {p} produced no result (rc={r.returncode})")
        print(json.dumps(results))
        return
    _run_one()


def _run_one():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="full,fwd,backbone,knn,loss,match")
    ap.add_argument("--n-points", type=int, default=30720)
    ap.add_argument("--v0", type=int, default=32768)
    ap.add_argument("--queries", type=int, default=40)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--knn-mode", default="grid")
    ap.add_argument("--trace", default="")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    log("devices:", jax.devices())

    from autoinst_tpu.models.maskpls import sparse
    from autoinst_tpu.models.maskpls.model import (
        MaskPLSConfig, MaskPS, create_train_state, train_step, mask_loss,
        matching_costs, hungarian_match)
    from autoinst_tpu.models.maskpls.pseudo_dataset import collate

    cfg = MaskPLSConfig(num_queries=args.queries, batch_acc=1,
                        remat=args.remat, compute_dtype=args.dtype,
                        knn_mode=args.knn_mode)
    scene = synth_scene(0, args.n_points)
    batch_np, targets_np = collate([scene], res=0.05, v0=args.v0,
                                   n_points=args.n_points,
                                   t_max=min(40, args.queries))
    for l, lv in enumerate(batch_np["levels"]):
        log(f"level {l}: V={lv['nbr3'].shape[1]} "
            f"(real {int(lv['valid'].sum())})")
    batch = jax.tree.map(jnp.asarray, batch_np)
    targets = jax.tree.map(jnp.asarray, targets_np)
    rng = jax.random.PRNGKey(0)

    parts = args.parts.split(",")
    results = {}

    state = None
    if {"full", "fwd", "fwdonly", "backbone"} & set(parts):
        log("init params...")
        state = create_train_state(jax.random.PRNGKey(0), cfg, batch)
        log("init done")

    model = MaskPS(cfg)
    variables = None
    if state is not None:
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

    if args.trace:
        jax.profiler.start_trace(args.trace)

    if "full" in parts:
        f = lambda s: train_step(s, batch, targets, rng, cfg)
        t = timed(lambda s: f(s)[1], args.reps, state)
        results["full_train_step"] = t
        log(f"full_train_step: {t:.3f} s")

    if "fwd" in parts:
        @jax.jit
        def fwd(params, stats, b, tg, key):
            out, mut = model.apply({"params": params, "batch_stats": stats},
                                   b, train=True, mutable=["batch_stats"])
            total, _ = mask_loss(out[0], tg, key, cfg)
            return total
        t = timed(fwd, args.reps, state.params, state.batch_stats, batch,
                  targets, rng)
        results["loss_fn_forward"] = t
        log(f"loss_fn_forward: {t:.3f} s")

    if "fwdonly" in parts:
        @jax.jit
        def fwd_only(params, stats, b):
            out, _ = model.apply({"params": params, "batch_stats": stats},
                                 b, train=True, mutable=["batch_stats"])
            return out[0]["pred_masks"]
        t = timed(fwd_only, args.reps, state.params, state.batch_stats,
                  batch)
        results["model_forward"] = t
        log(f"model_forward (no loss): {t:.3f} s")

    if "backbone" in parts:
        from autoinst_tpu.models.maskpls.backbone import MinkUNet
        bb = MinkUNet(n_classes=cfg.num_classes,
                      dtype=jnp.dtype(cfg.compute_dtype).type,
                      remat=cfg.remat, name="backbone")
        v0b = batch["levels"][0]["nbr3"].shape[1]

        @jax.jit
        def bb_fwd(params, stats, b):
            vox_feats = jax.vmap(sparse.voxelize_features,
                                 in_axes=(0, 0, 0, None))(
                b["pt_feats"], b["point_voxel"], b["pt_valid"],
                v0b + 1)[:, :v0b]
            out = bb.apply({"params": params, "batch_stats": stats},
                           {**b, "vox_feats": vox_feats}, train=True,
                           mutable=["batch_stats"])
            return out[0][0]
        t = timed(bb_fwd, args.reps, state.params["backbone"],
                  state.batch_stats["backbone"], batch)
        results["backbone_forward"] = t
        log(f"backbone_forward: {t:.3f} s")

    for p in parts:
        # knn:<mode>:<level> -- one jit per subprocess (axon executable
        # budget), standalone with the backbone's real shapes
        if not p.startswith("knn:"):
            continue
        _, mode, lvl_s = p.split(":")
        lvl_id = int(lvl_s)
        lvl = batch["levels"][lvl_id]
        c = {4: 256, 3: 256, 2: 128, 1: 96, 0: 96}[lvl_id]
        feats = jnp.ones(lvl["coords"].shape[:2] + (c,), jnp.float32)
        if mode == "exact":
            @jax.jit
            def kup(co, va, fe, pc):
                return jax.vmap(sparse.knn_up)(co, va, fe, pc)
            t = timed(kup, args.reps, lvl["coords"], lvl["valid"],
                      feats, batch["pt_coords"])
        else:
            pvs = [batch_np["point_voxel"]]
            for l in range(lvl_id):
                parent = batch_np["levels"][l]["parent"]
                prev = np.minimum(pvs[-1], parent.shape[1] - 1)
                pvs.append(np.take_along_axis(parent, prev, axis=1))

            cell = batch_np["levels"][lvl_id].get("cell")

            @jax.jit
            def kup_grid(co, fe, pc, pv, nbr):
                return jax.vmap(lambda c_, f_, p_, v_, n_:
                                sparse.knn_up_grid(c_, f_, p_, v_, n_,
                                                   cell=cell))(
                    co, fe, pc, pv, nbr)
            t = timed(kup_grid, args.reps, lvl["coords"], feats,
                      batch["pt_coords"], jnp.asarray(pvs[lvl_id]),
                      lvl["nbr3"])
        key = f"knn_{mode}_l{lvl_id}"
        results[key] = t
        log(f"{key} (V={lvl['coords'].shape[1]}): {t:.3f} s")

    if "loss" in parts or "match" in parts:
        # synthetic decoder outputs (no model forward: stays within the
        # axon per-process executable budget); values realistic enough for
        # timing -- LSAP iteration counts are data-dependent but bounded
        nl = 10
        q1 = args.queries
        rng_np = np.random.default_rng(0)

        def synth_out():
            return {"pred_logits": jnp.asarray(
                        rng_np.normal(size=(1, q1, 2)).astype(np.float32)),
                    "pred_masks": jnp.asarray(rng_np.normal(
                        size=(1, args.n_points, q1)).astype(np.float32))}
        outputs = synth_out()
        outputs["aux_outputs"] = [synth_out() for _ in range(nl - 1)]

        if "loss" in parts:
            @jax.jit
            def lz(o, tg, key):
                return mask_loss(o, tg, key, cfg)[0]
            t = timed(lz, args.reps, outputs, targets, rng)
            results["mask_loss_total"] = t
            log(f"mask_loss (all levels, incl match): {t:.3f} s")

        if "match" in parts:
            @jax.jit
            def costs_fn(o, tg, key):
                lv = [o] + list(o.get("aux_outputs", []))
                return jnp.stack([
                    matching_costs(x, tg, jax.random.fold_in(key, i),
                                   cfg) for i, x in enumerate(lv)])
            costs = jax.block_until_ready(costs_fn(outputs, targets, rng))
            t = timed(costs_fn, args.reps, outputs, targets, rng)
            results["matching_costs"] = t
            log(f"matching_costs ({nl} levels): {t:.3f} s")
            t = timed(jax.jit(hungarian_match), args.reps, costs)
            results["hungarian_match"] = t
            log(f"hungarian_match: {t:.3f} s")

    if args.trace:
        jax.profiler.stop_trace()

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
