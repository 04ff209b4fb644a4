#!/usr/bin/env python
"""One-command real-data parity runner (VERDICT r1 #4).

Runs BASELINE.json configs 1-2 (NCuts Spatial, NCuts TARL/Spatial) on
SemanticKITTI sample map 1 (sequence 00, first 1000 scans, TEST_MAP
semantics) the moment real data is available, and diffs the resulting
sequence metrics against the reference's committed numbers
(reference README.md:97-98 / pipeline/results/spatial_1.0_t_0.075 0:1).

Data detection: $AUTOINST_DATASET_PATH (or --data) must point at a
SemanticKITTI root: sequences/00/velodyne + labels, poses/00.txt,
calib.txt, and the TARL feature cache tarl_features/00 for config 2
(cache contract: datasets/kitti.py). Without real data, --synthetic runs
the same harness end-to-end on a generated map (numbers then validate the
MECHANISM, not reference parity).

Usage:
  python scripts/run_parity.py [--data /path/to/semantic_kitti]
                               [--configs spatial,tarl_spatial]
                               [--backend auto|host|device] [--synthetic]
Writes <out>/parity_report.json and prints a comparison table.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# reference committed results on sample map 1 (README.md:97-98; committed
# JSON pipeline/results/spatial_1.0_t_0.075 0:1 for the spatial config)
REFERENCE = {
    "spatial": {"p": 0.8615, "r": 0.7568, "f1": 0.8058, "ap": 0.4291,
                "ap0.25": 0.7693, "ap0.5": 0.6287, "S_assoc": 0.7019},
    "tarl_spatial": {"p": 0.8769, "r": 0.7702, "f1": 0.8201, "ap": 0.5374,
                     "S_assoc": 0.7105},
}
TOLERANCE = 0.02  # |ours - reference| per metric counted as parity


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def detect_dataset(path: str) -> dict:
    """Check the on-disk contract; returns {ok, missing: [...]}."""
    need = {
        "velodyne": os.path.join(path, "sequences", "00", "velodyne"),
        "labels": os.path.join(path, "sequences", "00", "labels"),
        "poses": os.path.join(path, "poses", "00.txt"),
        "calib": os.path.join(path, "sequences", "00", "calib.txt"),
    }
    optional = {
        "tarl_cache": os.path.join(path, "tarl_features", "00"),
    }
    missing = [k for k, p in need.items() if not os.path.exists(p)]
    missing_opt = [k for k, p in optional.items() if not os.path.exists(p)]
    return {"ok": not missing, "missing": missing,
            "missing_optional": missing_opt}


def run_config(name: str, data_root: str, out_root: str, backend: str,
               synthetic: bool, out_suffix: str = ""):
    import numpy as np
    from autoinst_tpu.datasets import create_kitti_odometry_dataset
    from autoinst_tpu.pipeline.config import (PipelineConfig, config_spatial,
                                              config_tarl_spatial)
    from autoinst_tpu.pipeline.run_pipeline import run

    weight_cfg = {"spatial": config_spatial,
                  "tarl_spatial": config_tarl_spatial}[name]
    kw = {}
    if synthetic:
        kw = dict(chunk_size=np.array([25, 25, 25]), overlap=3,
                  metrics_min_points=200, min_map_scans=2,
                  ncut_method="eigh", ncut_backend="host",
                  use_pallas=False)
    else:
        # the reference's TEST_MAP run: defaults (chunk 25, overlap 3,
        # min_points 200, map_scans 1000) == config.py knob surface
        kw = dict(ncut_backend=backend)
    if out_suffix == "_twin":
        kw["ncut_backend"] = "reference"   # scipy/ARPACK twin chain
    cfg = PipelineConfig(
        dataset_path=data_root, config=dict(weight_cfg), seqs=(0,),
        test_map=True,
        # both sides: first-occurrence label renumbering so the
        # label-ascending AP/greedy tie-breaks don't turn identical
        # segmentations into a metric diff (instance_metrics.py)
        canonical_label_order=True,
        out_folder=os.path.join(out_root, name + out_suffix) + "/", **kw)
    factory = lambda seq: create_kitti_odometry_dataset(
        data_root, seq, ncuts_mode=True)
    results = run(cfg, dataset_factory=factory)
    return results[0]["sequence"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=os.environ.get(
        "AUTOINST_DATASET_PATH", ""))
    ap.add_argument("--configs", default="spatial,tarl_spatial")
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--synthetic", action="store_true",
                    help="no real data: run the harness on a generated map")
    ap.add_argument("--twin", action="store_true",
                    help="also run the reference-algorithm twin "
                         "(scipy/ARPACK chain, ncuts/reference_twin.py) on "
                         "the same map and fill parity_within_tol with the "
                         "ours-vs-reference-algorithm diff")
    ap.add_argument("--out", default=os.path.join(REPO, ".parity"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--map", default="",
                    help="with --synthetic: use an EXISTING generated map "
                         "root instead of the default easy one (e.g. the "
                         "NCuts-hard selftrain demo map, where metrics are "
                         "far from saturation and twin agreement is "
                         "non-trivial -- VERDICT r3 #4)")
    args = ap.parse_args()

    if args.cpu or args.synthetic:
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.synthetic and args.map:
        data_root = args.map
        if not os.path.exists(os.path.join(data_root, "poses", "00.txt")):
            log(f"ERROR: no generated map at {data_root}")
            sys.exit(2)
        log("existing synthetic map at", data_root)
    elif args.synthetic:
        from synthetic_kitti import generate_sequence
        data_root = os.path.join(args.out, "synthetic_kitti")
        if not os.path.exists(os.path.join(data_root, "poses", "00.txt")):
            generate_sequence(data_root, n_scans=30, step=2.0,
                              points_per_object=500, ground_points=6000,
                              n_objects=8, seed=7, varied_objects=True,
                              n_clutter=10, ring_ground=True)
        log("synthetic map at", data_root)
    else:
        data_root = args.data
        if not data_root:
            log("ERROR: no dataset. Set AUTOINST_DATASET_PATH or pass "
                "--data (or --synthetic for a mechanism check).")
            sys.exit(2)
        probe = detect_dataset(data_root)
        if not probe["ok"]:
            log(f"ERROR: dataset at {data_root} missing {probe['missing']}")
            sys.exit(2)
        if probe["missing_optional"]:
            log(f"note: missing optional {probe['missing_optional']} -- "
                "config tarl_spatial needs the TARL cache")

    os.makedirs(args.out, exist_ok=True)
    report = {"data_root": data_root, "synthetic": args.synthetic,
              "configs": {}}
    for name in args.configs.split(","):
        name = name.strip()
        log(f"=== running config {name} ===")
        stats = run_config(name, data_root, args.out, args.backend,
                           args.synthetic)
        ref = REFERENCE.get(name, {})
        diffs = {k: round(stats[k] - ref[k], 4) for k in ref if k in stats}
        entry = {"ours": stats, "reference_published": ref,
                 "diff_published": diffs}
        log(f"{name}: ours={ {k: round(v, 4) for k, v in stats.items()} }")
        log(f"{name}: diff vs published reference={diffs}")
        if args.twin:
            # the comparison that is valid on ANY shared map: ours vs the
            # reference ALGORITHM (scipy/ARPACK twin) on identical data
            log(f"=== running reference twin for {name} ===")
            twin = run_config(name, data_root, args.out, args.backend,
                              args.synthetic, out_suffix="_twin")
            twin_diffs = {k: round(stats[k] - twin[k], 4)
                          for k in twin if k in stats}
            entry["reference_twin"] = twin
            entry["diff_twin"] = twin_diffs
            entry["parity_within_tol"] = all(
                abs(d) <= TOLERANCE for d in twin_diffs.values())
            log(f"{name}: twin={ {k: round(v, 4) for k, v in twin.items()} }")
            log(f"{name}: diff ours-vs-twin={twin_diffs} "
                f"within_tol={entry['parity_within_tol']}")
        else:
            # published numbers are real-KITTI; without --twin there is no
            # same-data comparison to verdict on a synthetic map
            entry["parity_within_tol"] = (
                all(abs(d) <= TOLERANCE for d in diffs.values())
                if not args.synthetic else None)
        report["configs"][name] = entry

    path = os.path.join(args.out, "parity_report.json")
    with open(path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report["configs"], indent=1))
    log("report written to", path)


if __name__ == "__main__":
    main()
