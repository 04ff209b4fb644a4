#!/usr/bin/env python
"""Build one extra self-training map end-to-end: gen -> NCuts export
(overlap 24) -> pseudo-oracle merged map -> merged relabel.

Produces WORK/out_merged24/train/0/*.npz — the same globally-consistent
merged-relabel training chunks the flagship map uses (see
scripts/relabel_from_merged.py) — for a FRESH map seed. Symlinking several
maps' chunk leaves under one parent directory trains MaskPLS on all of
them (PseudoDataset walks subdirectories), which is how the reference's
self-training gains generalization: scale of pseudo-labeled data, not one
memorized map (reference README.md:100, predict_maskpls.py:133-158).

Each phase runs in a SUBPROCESS: the axon TPU transport supports only one
big hot executable per process (CLAUDE.md), and the export phase compiles
the batched NCut solver. Phases are idempotent via their artifacts, like
scripts/chain_r3b.sh.

Usage: python scripts/make_training_map.py --seed 2042 \
           [--work .selftrain_map2042] [--device] [--overlap 24]
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print("[map]", *a, file=sys.stderr, flush=True)


def run_step(name, cmd, artifact):
    if artifact and os.path.exists(artifact):
        log(f"{name}: artifact exists, skipping ({artifact})")
        return
    log(name, "->", " ".join(cmd))
    subprocess.run(cmd, cwd=REPO, check=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--work", default="")
    ap.add_argument("--overlap", type=int, default=24)
    ap.add_argument("--device", action="store_true",
                    help="run the export NCuts on the real TPU (do NOT "
                         "combine with a concurrent TPU training run; the "
                         "tunnel is single-tenant in practice)")
    args = ap.parse_args()

    work = args.work or os.path.join(REPO, f".selftrain_map{args.seed}")
    py = sys.executable
    demo = os.path.join(REPO, "scripts", "selftrain_demo.py")

    run_step("gen", [py, demo, "gen", "--work", work,
                     "--seed", str(args.seed)],
             os.path.join(work, "kitti", "poses", "00.txt"))
    export_cmd = [py, demo, "export", "--work", work,
                  "--overlap", str(args.overlap), "--out", "out_export24"]
    if args.device:
        export_cmd.append("--device")
    train0 = os.path.join(work, "out_export24", "train", "0")
    run_step("export", export_cmd,
             train0 if os.path.isdir(train0) and
             any(f.endswith(".npz") for f in os.listdir(train0)) else "")
    merged = os.path.join(work, "out_refined_pseudoracle", "0",
                          "maskpls_tarl_spatial_0_0.pcd")
    run_step("pseudoracle",
             [py, os.path.join(REPO, "scripts", "eval_oracle.py"),
              "--work", work, "--source", "pseudo", "--tag", "pseudoracle"],
             merged)
    out = os.path.join(work, "out_merged24", "train", "0")
    run_step("relabel",
             [py, os.path.join(REPO, "scripts", "relabel_from_merged.py"),
              "--merged", merged, "--train", train0, "--out", out],
             out if os.path.isdir(out) and
             any(f.endswith(".npz") for f in os.listdir(out)) else "")
    n = len([f for f in os.listdir(out) if f.endswith(".npz")])
    log(f"done: {n} merged-relabel chunks under {out}")


if __name__ == "__main__":
    main()
