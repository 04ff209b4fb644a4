#!/usr/bin/env python
"""Self-training quality loop on a medium synthetic map (VERDICT r1 #2).

Phases (run separately; each is resumable via on-disk artifacts):
  gen       build a hard synthetic KITTI map (clutter, adjacent pairs,
            ring ground, density falloff) under WORK/kitti
  export    run the NCuts TARL/Spatial pipeline with self-train export:
            training chunks under WORK/out_export/train/0
  baseline  run the same config in TEST_MAP mode -> NCuts metrics JSON
  train     train MaskPLS on the exported chunks (REAL TPU via the train
            CLI; run under nohup, takes hours)
  eval      run the MaskPLS-refined pipeline with the trained weights ->
            refined metrics JSON; prints refined-vs-NCuts comparison

The reference relationship to reproduce: the refined branch beats the
NCuts branch on the same map (reference README.md:98 vs :100, +12 AP).

Usage: python scripts/selftrain_demo.py <phase> [--work DIR]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SEED = 42
N_SCANS = 80
STEP = 1.5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _gen_map(root, seed):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from synthetic_kitti import generate_sequence
    if os.path.exists(os.path.join(root, "poses", "00.txt")):
        log("map already generated:", root)
        return
    # object_span spreads objects along the WHOLE trajectory: without it
    # (round-2 map) objects sat in x in [6,36] of a 120 m drive, 3 of 4
    # eval chunks were pure ground, and all object metrics hinged on one
    # chunk (NOTES_ROUND2.md "the demo MAP is degenerate").
    # paired_tarl + 10 adjacent pairs + dense clutter keep NCuts honest on
    # the spread map: with per-instance one-hot TARL the spread map was
    # TRIVIAL (round-3 baseline scored p=r=f1=1.0, leaving the refined
    # branch nothing to beat); pairs sharing a TARL signature reproduce
    # the real failure mode (spatial cuts merge ~1.2 m neighbors).
    generate_sequence(
        root, n_scans=N_SCANS, step=STEP, points_per_object=700,
        ground_points=9000, n_objects=20, seed=seed, varied_objects=True,
        adjacent_pairs=10, n_clutter=50, ring_ground=True,
        density_falloff=True, object_span=N_SCANS * STEP,
        paired_tarl=True, tarl_noise=0.08, pair_gap=(0.35, 1.0),
        n_large=8)
    log("map written to", root)


def phase_gen(work, seed=SEED):
    _gen_map(os.path.join(work, "kitti"), seed)


def _factory(root):
    from autoinst_tpu.datasets import create_kitti_odometry_dataset
    return lambda seq: create_kitti_odometry_dataset(
        str(root), seq, ncuts_mode=True)


def _base_cfg(work, out_name, root=None, **kw):
    import numpy as np
    from autoinst_tpu.pipeline.config import (PipelineConfig,
                                              config_tarl_spatial)
    root = root or os.path.join(work, "kitti")
    cfg = PipelineConfig(
        dataset_path=root, config=dict(config_tarl_spatial), seqs=(0,),
        chunk_size=np.array([25, 25, 25]), metrics_min_points=200,
        min_map_scans=2, ncut_method="eigh", ncut_backend="host",
        use_pallas=False,
        out_folder=os.path.join(work, out_name) + "/", **kw)
    return cfg, _factory(root)


def phase_export(work, overlap=18, device=False, out_name="out_export"):
    import jax
    if device:
        # real TPU: batched single-executable solver path (bench-proven
        # 16x4096 dispatch); see batch_runner uniform-width note
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                              os.path.join(REPO, ".jax_cache"))
    else:
        jax.config.update("jax_platforms", "cpu")
    from autoinst_tpu.pipeline.run_pipeline import run
    cfg, factory = _base_cfg(work, out_name, gen_self_train_data=True)
    # reference parity at overlap=24: a training chunk every 1 m
    # (config.py:75-77); 18 = every 7 m (the fast CPU variant)
    cfg.overlap = overlap
    if device:
        cfg.batched_chunks = True
        cfg.ncut_backend = "device"
        cfg.ncut_method = "auto"
        cfg.use_pallas = True
    run(cfg, dataset_factory=factory)
    train_dir = os.path.join(cfg.out_folder_train, "0")
    n = len([f for f in os.listdir(train_dir) if f.endswith(".npz")])
    log(f"exported {n} training chunks to {train_dir}")


def _args_extra(ap):
    ap.add_argument("--overlap", type=int, default=18)
    ap.add_argument("--device", action="store_true",
                    help="run the export NCuts on the real TPU (batched "
                         "single-executable solver)")
    ap.add_argument("--out", default="out_export",
                    help="export output folder name under --work")
    ap.add_argument("--data", default="",
                    help="train/eval: training-chunk dir override")


def phase_baseline(work):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from autoinst_tpu.pipeline.run_pipeline import run
    cfg, factory = _base_cfg(work, "out_baseline")
    cfg.overlap = 3
    results = run(cfg, dataset_factory=factory)
    stats = results[0]["sequence"]
    path = os.path.join(work, "ncuts_baseline.json")
    with open(path, "w") as fh:
        json.dump(stats, fh)
    log("NCuts baseline:", stats)


def phase_train(work, epochs, dtype, data="", cache_batches=12, aug=True,
                ckpt_name="ckpts", eos_coef=1.0, cpu=False, batch_acc=4,
                lr=1e-4, reset_opt=False, grad_clip=0.5, schedule=False,
                warmup=100, match_exact=False, match_joint=False,
                init_from=""):
    # real TPU by default; the container pins the axon platform, so a CPU
    # run (tunnel outage hedge) must force it in-process -- the
    # JAX_PLATFORMS env var alone is overridden (CLAUDE.md)
    if cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, ".jax_cache"))
    from autoinst_tpu.models.maskpls.model import MaskPLSConfig
    from autoinst_tpu.models.maskpls.train import train
    data = data or os.path.join(work, "out_export", "train")
    ckpt = os.path.join(work, ckpt_name)
    resume = ""
    last = os.path.join(ckpt, "maskpls_last.ckpt")
    if os.path.exists(last):
        resume = last
    else:
        # wipe/interrupt recovery: fall back to the newest periodic
        # checkpoint; total_horizon=True below makes the rerun continue to
        # the ORIGINAL epoch horizon (same cosine endpoint), not extend it
        import glob
        eps = sorted(glob.glob(os.path.join(ckpt, "maskpls_epoch*.ckpt")))
        if eps:
            resume = eps[-1]
        elif init_from and os.path.exists(init_from):
            # warm start from ANOTHER run's checkpoint (params only: the
            # new run gets its own optimizer + schedule) -- multimap
            # fine-tuning from the flagship single-map checkpoint
            resume, reset_opt = init_from, True
    # aug on + 12 cached draw/aug variants per chunk: the first (no-aug,
    # 2-draw) run memorized its 24 fixed batches -- train loss 15.8 but
    # ~50 on any fresh draw and mask dice ~0.8 at inference
    train(data, epochs=epochs, ckpt_dir=ckpt, resume=resume,
          reset_opt=reset_opt, total_horizon=True,
          v0=32768, n_points=30720, t_max=40, ckpt_every=25,
          min_points=100, subsample=30000, cache_batches=cache_batches,
          aug=aug, cfg=MaskPLSConfig(compute_dtype=dtype, num_queries=40,
                                     eos_coef=eos_coef, batch_acc=batch_acc,
                                     lr=lr, grad_clip=grad_clip,
                                     lr_total_steps=-1 if schedule else 0,
                                     lr_warmup=warmup,
                                     match_exact=match_exact,
                                     match_joint=match_joint))


def _refined_eval(work, ckpt_name, root, out_name, json_name,
                  baseline_json):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from autoinst_tpu.models.maskpls.model import MaskPLSConfig
    from autoinst_tpu.pipeline.config import config_maskpls_tarl_spatial
    from autoinst_tpu.pipeline.run_pipeline import run
    weights = os.path.join(work, ckpt_name, "maskpls_weights.msgpack")
    widths_file = os.path.join(work, ckpt_name, "level_widths.json")
    kwargs = {"cfg": MaskPLSConfig(num_queries=40), "v0": 32768,
              "n_points": 30720}
    if os.path.exists(widths_file):
        with open(widths_file) as fh:
            kwargs["level_widths"] = json.load(fh)
    cfg, factory = _base_cfg(work, out_name, root=root,
                             maskpls_weights=weights,
                             maskpls_kwargs=kwargs)
    cfg.config = dict(config_maskpls_tarl_spatial)
    cfg.overlap = 3
    results = run(cfg, dataset_factory=factory)
    stats = results[0]["sequence"]
    path = os.path.join(work, json_name)
    with open(path, "w") as fh:
        json.dump(stats, fh)
    log(json_name.replace(".json", "") + ":", stats)
    base_path = os.path.join(work, baseline_json)
    if os.path.exists(base_path):
        with open(base_path) as fh:
            base = json.load(fh)
        log("comparison (refined - ncuts):",
            {k: round(stats[k] - base[k], 4)
             for k in ("p", "r", "f1", "ap", "S_assoc") if k in base})
    return stats


def phase_eval(work, ckpt_name="ckpts"):
    _refined_eval(work, ckpt_name, None, "out_refined", "refined.json",
                  "ncuts_baseline.json")


HOLDOUT_SEED = 1042


def phase_holdout(work, ckpt_name="ckpts", skip_baseline=False):
    """Generalization check (VERDICT r3 #2): evaluate the SAME trained
    checkpoint on a second synthetic map (different seed, same generator) it
    never saw, next to an NCuts baseline on that map. The reference's +12 AP
    headline is a generalization claim -- the refiner segments arbitrary
    chunks (reference predict_maskpls.py:133-158) -- so a memorized-geometry
    win alone would misrepresent it."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    root = os.path.join(work, "kitti_holdout")
    _gen_map(root, HOLDOUT_SEED)
    if not skip_baseline:
        from autoinst_tpu.pipeline.run_pipeline import run
        cfg, factory = _base_cfg(work, "out_holdout_ncuts", root=root)
        cfg.overlap = 3
        results = run(cfg, dataset_factory=factory)
        stats = results[0]["sequence"]
        with open(os.path.join(work, "ncuts_holdout.json"), "w") as fh:
            json.dump(stats, fh)
        log("NCuts holdout baseline:", stats)
    _refined_eval(work, ckpt_name, root, "out_holdout_refined",
                  "refined_holdout.json", "ncuts_holdout.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["gen", "export", "baseline", "train",
                                      "eval", "holdout"])
    ap.add_argument("--skip-baseline", action="store_true",
                    help="holdout: only run the refined arm (baseline "
                         "already computed)")
    ap.add_argument("--work", default=os.path.join(REPO, ".selftrain"))
    ap.add_argument("--seed", type=int, default=SEED,
                    help="gen: synthetic-map seed (extra training maps "
                         "for generalization use fresh seeds; 42 is the "
                         "demo map, 1042 the holdout)")
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cache-batches", type=int, default=12)
    ap.add_argument("--no-aug", action="store_true")
    ap.add_argument("--eos-coef", type=float, default=1.0)
    ap.add_argument("--batch-acc", type=int, default=4,
                    help="gradient accumulation steps (1 = 4x more "
                         "optimizer updates per epoch at same wall time)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--grad-clip", type=float, default=0.5,
                    help="global-norm gradient clip (reference Trainer "
                         "gradient_clip_val 0.5; at batch 1 + lr 1e-4 the "
                         "0.5 clip can throttle memorization)")
    ap.add_argument("--schedule", action="store_true",
                    help="linear-warmup + cosine LR decay over the run "
                         "(deviation from the reference's constant LR; "
                         "settles late-run assignment-flip instability)")
    ap.add_argument("--warmup", type=int, default=100,
                    help="warmup steps for --schedule")
    ap.add_argument("--match-exact", action="store_true",
                    help="Hungarian costs on ALL valid points (no 40% "
                         "subsample): removes the sampling noise that "
                         "churns small-mask assignments")
    ap.add_argument("--match-joint", action="store_true",
                    help="one assignment (summed per-level costs) for all "
                         "deep-supervision levels: consistent class-head "
                         "supervision")
    ap.add_argument("--reset-opt", action="store_true",
                    help="resume params only (fresh optimizer; required "
                         "when --batch-acc changes across segments)")
    ap.add_argument("--ckpt-name", default="ckpts")
    ap.add_argument("--init-from", default="",
                    help="train: warm-start params from another run's "
                         "checkpoint when this run has none yet "
                         "(multimap fine-tune from the flagship ckpt)")
    ap.add_argument("--cpu", action="store_true",
                    help="train: force the CPU backend (tunnel-outage "
                         "hedge; checkpoints stay TPU-resumable)")
    _args_extra(ap)
    args = ap.parse_args()
    os.makedirs(args.work, exist_ok=True)
    if args.phase == "gen":
        phase_gen(args.work, seed=args.seed)
    elif args.phase == "export":
        phase_export(args.work, overlap=args.overlap, device=args.device,
                     out_name=args.out)
    elif args.phase == "baseline":
        phase_baseline(args.work)
    elif args.phase == "train":
        phase_train(args.work, args.epochs, args.dtype, data=args.data,
                    cache_batches=args.cache_batches, aug=not args.no_aug,
                    ckpt_name=args.ckpt_name, eos_coef=args.eos_coef,
                    cpu=args.cpu, batch_acc=args.batch_acc, lr=args.lr,
                    reset_opt=args.reset_opt, grad_clip=args.grad_clip,
                    schedule=args.schedule, warmup=args.warmup,
                    match_exact=args.match_exact,
                    match_joint=args.match_joint,
                    init_from=args.init_from)
    elif args.phase == "eval":
        phase_eval(args.work, ckpt_name=args.ckpt_name)
    elif args.phase == "holdout":
        phase_holdout(args.work, ckpt_name=args.ckpt_name,
                      skip_baseline=args.skip_baseline)


if __name__ == "__main__":
    main()
