"""MaskPLS self-training CLI.

Equivalent of the reference Lightning trainer (self-training/mask_pls/
scripts/train_model.py:16-77): AdamW lr 1e-4, gradient clip 0.5, gradient
accumulation 4, batch size 1, periodic checkpoints with resume, per-epoch
panoptic telemetry -- as an explicit jit train loop.

Usage:
  python -m autoinst_tpu.models.maskpls.train --data <train_chunk_dir> \
      [--epochs N] [--ckpt-dir DIR] [--resume CKPT]

Telemetry goes to <ckpt-dir>/train_log.jsonl (no external services; the
reference's hardcoded wandb entity, mask_model.py:27, is deliberately not
reproduced).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from autoinst_tpu.models.maskpls.model import (MaskPLSConfig,
                                               create_train_state,
                                               train_step)
from autoinst_tpu.models.maskpls.pseudo_dataset import (
    PseudoDataset, collate, dataset_level_widths)


def save_checkpoint(path: str, state):
    from flax import serialization
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    with open(path, "wb") as fh:
        fh.write(serialization.to_bytes(payload))


def load_checkpoint(path: str, state):
    from flax import serialization
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    with open(path, "rb") as fh:
        payload = serialization.from_bytes(template, fh.read())
    return state.replace(params=payload["params"],
                         batch_stats=payload["batch_stats"],
                         opt_state=payload["opt_state"],
                         step=payload["step"])


def train(data_path: str, epochs: int = 10, ckpt_dir: str = "checkpoints",
          resume: str = "", cfg: MaskPLSConfig = MaskPLSConfig(),
          v0: int = 65536, n_points: int = 81920, t_max: int = 40,
          ckpt_every: int = 1, seed: int = 0, subsample: int = 80000,
          min_points: int = 100, limit_steps: int | None = None,
          dataset_kind: str = "pseudo", cache_batches: int = 0,
          aug: bool = True, reset_opt: bool = False,
          total_horizon: bool = False):
    """dataset_kind: 'pseudo' = NCuts pseudo-label chunks (class-agnostic
    self-training), 'semantic' = GT SemanticKITTI scans (supervised; items
    carry sem_labels so cfg.sem_loss can supervise the backbone head).

    cache_batches: 0 = collate every step (reference behavior, fresh
    subsample per epoch); K>0 = precompute K subsample draws per chunk and
    cycle them across epochs. The host-side VoxelPlan build is O(seconds)
    per 30k-point chunk on a small host -- without the cache it, not the
    TPU step, bounds throughput.

    total_horizon: when True, `epochs` is the run's TOTAL horizon rather
    than epochs-to-run: a resumed checkpoint skips the epochs its step
    count already covers, so an interrupted run re-launched with the SAME
    arguments continues to the same cosine-schedule endpoint instead of
    extending it. This is what makes the selftrain chain resumable across
    host wipes (the reference trainer gets this from Lightning's
    epoch-counted ckpt_path resume, train_model.py:69-77)."""
    if dataset_kind == "semantic":
        from autoinst_tpu.models.maskpls.semantic_dataset import \
            SemanticKittiScanDataset
        dataset = SemanticKittiScanDataset(
            data_path, split="train", min_points=min_points,
            sub_pts=subsample, subsample=True, seed=seed)
    else:
        # aug on by default (reference pseudo_dataset cfg AUG); with
        # cache_batches > 0 each cached draw bakes its own rotation/flip,
        # so pick enough draws to cover the symmetry group
        dataset = PseudoDataset(data_path, min_points=min_points,
                                sub_pts=subsample, subsample=True, aug=aug,
                                seed=seed)
    if len(dataset) == 0:
        raise ValueError(f"no training chunks under {data_path}")
    os.makedirs(ckpt_dir, exist_ok=True)
    log_path = os.path.join(ckpt_dir, "train_log.jsonl")

    # uniform static shapes across the whole run: ONE compile of the train
    # step instead of one per distinct chunk occupancy (XLA recompiles per
    # shape set; per-chunk widths also hit an axon-transport bug where
    # re-executing an older executable after a newer compile fails)
    level_widths = dataset_level_widths(dataset, cfg.resolution, v0,
                                        sub_pts=subsample)
    print(f"uniform level widths: {level_widths}")
    with open(os.path.join(ckpt_dir, "level_widths.json"), "w") as fh:
        json.dump(level_widths, fh)  # refiner/eval reuse -> one executable

    cached = {}  # (chunk index, draw) -> collated (batch, targets)

    def make_batch(i):
        item = dataset[int(i)]
        if len(item["classes"]) == 0:
            return None  # skip chunks without instances (pseudo_dataset
            # reference :215-222 resamples; we skip)
        batch, targets = collate([item], cfg.resolution, v0, n_points,
                                 t_max, level_widths=level_widths)
        return (jax.tree.map(jnp.asarray, batch),
                jax.tree.map(jnp.asarray, targets))

    def batches(epoch=0):
        order = np.random.default_rng(seed + epoch).permutation(
            len(dataset))
        for i in order:
            if cache_batches > 0:
                key = (int(i), epoch % cache_batches)
                if key not in cached:
                    cached[key] = make_batch(i)
                out = cached[key]
            else:
                out = make_batch(i)
            if out is not None:
                yield out

    if cfg.lr_total_steps < 0:
        # auto horizon: cosine over this run's optimizer steps
        import dataclasses
        total = max(epochs * len(dataset) // max(cfg.batch_acc, 1), 1)
        cfg = dataclasses.replace(cfg, lr_total_steps=total)
        print(f"lr schedule: warmup {cfg.lr_warmup} + cosine over "
              f"{total} steps (peak {cfg.lr})")

    example = next(batches())
    state = create_train_state(jax.random.PRNGKey(seed), cfg, example[0])
    if resume and reset_opt:
        # params/batch_stats only: lets a checkpoint resume under a
        # DIFFERENT optimizer structure (e.g. batch_acc change rewraps the
        # tx in optax.MultiSteps, so the saved opt_state no longer matches)
        from flax import serialization
        with open(resume, "rb") as fh:
            raw = serialization.msgpack_restore(fh.read())
        state = state.replace(
            params=serialization.from_state_dict(state.params,
                                                 raw["params"]),
            batch_stats=serialization.from_state_dict(state.batch_stats,
                                                      raw["batch_stats"]))
        print(f"resumed params-only from {resume} (fresh optimizer)")
    elif resume:
        state = load_checkpoint(resume, state)
        print(f"resumed from {resume} at step {int(state.step)}")

    rng = jax.random.PRNGKey(seed + 1)
    step = int(state.step)
    start_epoch = 0
    if total_horizon and step > 0:
        # one optimizer-counted step per chunk per epoch (batch_acc lives
        # inside optax.MultiSteps, which still increments state.step per
        # microbatch), so step//len(dataset) = completed epochs
        start_epoch = min(step // max(len(dataset), 1), epochs)
        print(f"total-horizon resume: step {step} -> starting at epoch "
              f"{start_epoch}/{epochs}")
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        losses = []
        part_sums = {}
        for batch, targets in batches(epoch):
            rng, sub = jax.random.split(rng)
            state, total, parts = train_step(state, batch, targets, sub, cfg)
            losses.append(float(total))
            # final-level loss terms only (aux levels are prefixed "i_")
            for k, v in parts.items():
                if k != "total" and not k[0].isdigit():
                    part_sums[k] = part_sums.get(k, 0.0) + float(v)
            step += 1
            if limit_steps and step >= limit_steps:
                break
        secs = time.time() - t0
        n_steps = max(len(losses), 1)
        # JSONL telemetry (replaces the reference's wandb/TensorBoard role,
        # train_model.py:40-45): total + per-term means, lr, s/step
        from autoinst_tpu.models.maskpls.model import lr_schedule
        sched = lr_schedule(cfg)
        cur_lr = sched if isinstance(sched, float) else float(
            sched(step // max(cfg.batch_acc, 1)))
        entry = {"epoch": epoch, "step": step,
                 "loss": float(np.mean(losses)) if losses else None,
                 "secs": secs, "s_per_step": secs / n_steps, "lr": cur_lr,
                 **{k: v / n_steps for k, v in sorted(part_sums.items())}}
        with open(log_path, "a") as fh:
            fh.write(json.dumps(entry) + "\n")
        print(entry)
        if (epoch + 1) % ckpt_every == 0:
            save_checkpoint(os.path.join(
                ckpt_dir, f"maskpls_epoch{epoch:03d}.ckpt"), state)
        if limit_steps and step >= limit_steps:
            break
    save_checkpoint(os.path.join(ckpt_dir, "maskpls_last.ckpt"), state)
    # inference-weights export (the RefinerModel / pipeline contract)
    from flax import serialization
    with open(os.path.join(ckpt_dir, "maskpls_weights.msgpack"), "wb") as fh:
        fh.write(serialization.to_bytes({"params": state.params,
                                         "batch_stats": state.batch_stats}))
    return state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--ckpt-dir", default="checkpoints")
    ap.add_argument("--resume", default="")
    ap.add_argument("--n-points", type=int, default=81920)
    ap.add_argument("--v0", type=int, default=65536)
    ap.add_argument("--ckpt-every", type=int, default=1,
                    help="checkpoint every N epochs")
    ap.add_argument("--dtype", default="float32",
                    help="backbone GEMM compute dtype (bfloat16 = MXU-"
                         "native, ~16%% faster at 30k points)")
    ap.add_argument("--queries", type=int, default=40)
    ap.add_argument("--dataset", default="pseudo",
                    choices=("pseudo", "semantic"),
                    help="pseudo = NCuts chunk export; semantic = GT "
                         "SemanticKITTI scans (supervised)")
    ap.add_argument("--num-classes", type=int, default=1)
    ap.add_argument("--sem-loss", action="store_true",
                    help="add SemLoss (CE+Lovasz) on the backbone "
                         "semantic head (reference loss.py:366-476)")
    ap.add_argument("--eos-coef", type=float, default=1.0,
                    help="no-object CE weight (reference model.yaml "
                         "EOS_COEF 0.1; 1.0 = shipped-code parity)")
    args = ap.parse_args()
    train(args.data, epochs=args.epochs, ckpt_dir=args.ckpt_dir,
          resume=args.resume, n_points=args.n_points, v0=args.v0,
          ckpt_every=args.ckpt_every, dataset_kind=args.dataset,
          cfg=MaskPLSConfig(compute_dtype=args.dtype,
                            num_queries=args.queries,
                            num_classes=args.num_classes,
                            sem_loss=args.sem_loss,
                            eos_coef=args.eos_coef))


if __name__ == "__main__":
    main()
