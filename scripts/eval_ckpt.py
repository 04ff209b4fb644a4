#!/usr/bin/env python
"""Evaluate ANY MaskPLS checkpoint (epoch ckpt or final msgpack) through
the refined pipeline on the selftrain demo map — interim quality reads
while a long TPU training run is still going.

Reuses the overlap-independent stage caches (all_poses/kitti_labels/
ground pcds/subsampled — NOTES_ROUND2.md) from an existing out folder so
the eval skips aggregation.

Usage: python scripts/eval_ckpt.py CKPT [--work .selftrain]
           [--cache-from out_export24] [--tag ep099]
"""

import argparse
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--work", default=os.path.join(REPO, ".selftrain"))
    ap.add_argument("--cache-from", default="out_export24")
    ap.add_argument("--tag", default="interim")
    ap.add_argument("--widths", default="",
                    help="level_widths.json (default: alongside ckpt)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from flax import serialization

    out_name = f"out_refined_{args.tag}"
    out_dir = os.path.join(args.work, out_name)
    os.makedirs(out_dir, exist_ok=True)
    src = os.path.join(args.work, args.cache_from)
    for f in os.listdir(src):
        p = os.path.join(src, f)
        if os.path.isfile(p) and not os.path.exists(os.path.join(out_dir, f)):
            shutil.copy(p, out_dir)

    weights = args.ckpt
    if not weights.endswith(".msgpack"):
        conv = os.path.join(out_dir, "weights.msgpack")
        with open(weights, "rb") as fh:
            raw = serialization.msgpack_restore(fh.read())
        with open(conv, "wb") as fh:
            fh.write(serialization.msgpack_serialize(
                {"params": raw["params"], "batch_stats": raw["batch_stats"]}))
        weights = conv

    widths = args.widths or os.path.join(os.path.dirname(args.ckpt),
                                         "level_widths.json")
    from autoinst_tpu.models.maskpls.model import MaskPLSConfig
    from autoinst_tpu.pipeline.config import config_maskpls_tarl_spatial
    from autoinst_tpu.pipeline.run_pipeline import run
    from selftrain_demo import _base_cfg

    kwargs = {"cfg": MaskPLSConfig(num_queries=40), "v0": 32768,
              "n_points": 30720}
    if os.path.exists(widths):
        with open(widths) as fh:
            kwargs["level_widths"] = json.load(fh)
    cfg, factory = _base_cfg(args.work, out_name, maskpls_weights=weights,
                             maskpls_kwargs=kwargs)
    cfg.config = dict(config_maskpls_tarl_spatial)
    cfg.overlap = 3
    results = run(cfg, dataset_factory=factory)
    stats = results[0]["sequence"]
    path = os.path.join(args.work, f"refined_{args.tag}.json")
    with open(path, "w") as fh:
        json.dump(stats, fh)
    print("refined", args.tag, ":", stats, flush=True)
    base_path = os.path.join(REPO, "results", "selftrain_demo",
                             "ncuts_baseline.json")
    with open(base_path) as fh:
        base = json.load(fh)
    print("delta vs ncuts:", {k: round(stats[k] - base[k], 4)
                              for k in ("p", "r", "f1", "ap", "S_assoc")},
          flush=True)


if __name__ == "__main__":
    main()
