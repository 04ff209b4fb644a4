#!/usr/bin/env python
"""Checkpoint watcher: evaluate each new epoch checkpoint through the
refined pipeline (scripts/eval_ckpt.py, CPU backend) while a TPU training
run is going, appending one JSON line per checkpoint to
WORK/CKPT_DIR/watch_eval.jsonl.

Guards (learned the hard way in round 3):
  * a checkpoint is only picked up once its mtime is >90 s old -- the
    trainer writes large msgpack files non-atomically;
  * a failed eval is retried on the next poll instead of being marked
    done;
  * evaluation runs in a subprocess so a crash never kills the watcher.

Usage: python scripts/watch_eval.py --ckpt-dir .selftrain/ckpts_merged \
           [--poll 120] [--exit-after-idle 7200]
"""

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print("[watch]", *a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default=".selftrain/ckpts_merged")
    ap.add_argument("--work", default=os.path.join(REPO, ".selftrain"))
    ap.add_argument("--cache-from", default="out_export24")
    ap.add_argument("--poll", type=int, default=120)
    ap.add_argument("--min-age", type=int, default=90)
    ap.add_argument("--exit-after-idle", type=int, default=7200,
                    help="stop once no new checkpoint appears for this "
                         "many seconds (trainer finished or died)")
    ap.add_argument("--max-retries", type=int, default=3,
                    help="give up on a checkpoint after this many failed "
                         "evals (counted across watcher restarts)")
    args = ap.parse_args()

    out_path = os.path.join(args.ckpt_dir, "watch_eval.jsonl")
    done = set()
    fails: dict = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                    # only SUCCESSFUL evals are done; a restart must retry
                    # previously failed checkpoints (ADVICE r3)
                    if rec.get("rc") == 0:
                        done.add(rec["ckpt"])
                    else:
                        fails[rec["ckpt"]] = fails.get(rec["ckpt"], 0) + 1
                except (ValueError, KeyError):
                    pass
    seen = set()
    last_new = time.time()
    while True:
        cands = sorted(glob.glob(
            os.path.join(args.ckpt_dir, "maskpls_epoch*.ckpt")))
        for c in cands:
            # idle clock resets when a candidate first APPEARS, not when it
            # first succeeds -- else one permanently failing checkpoint
            # keeps the watcher alive forever (ADVICE r3)
            if os.path.basename(c) not in seen:
                seen.add(os.path.basename(c))
                last_new = time.time()
        fresh = [c for c in cands
                 if os.path.basename(c) not in done
                 and fails.get(os.path.basename(c), 0) < args.max_retries
                 and time.time() - os.path.getmtime(c) > args.min_age]
        if not fresh and time.time() - last_new > args.exit_after_idle:
            log("idle timeout, exiting")
            return
        for ckpt in fresh:
            name = os.path.basename(ckpt)
            m = re.search(r"epoch(\d+)", name)
            tag = f"ep{m.group(1)}" if m else "interim"
            log("evaluating", name)
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable,
                     os.path.join(REPO, "scripts/eval_ckpt.py"),
                     ckpt, "--work", args.work,
                     "--cache-from", args.cache_from, "--tag", tag],
                    capture_output=True, text=True, timeout=3600)
                rc, stderr = r.returncode, r.stderr
            except subprocess.TimeoutExpired:
                rc, stderr = -9, "eval timed out after 3600 s"
            rec = {"ckpt": name, "tag": tag, "rc": rc,
                   "eval_s": round(time.time() - t0, 1)}
            stats_path = os.path.join(args.work, f"refined_{tag}.json")
            if rc == 0 and os.path.exists(stats_path):
                with open(stats_path) as fh:
                    rec.update(json.load(fh))
                done.add(name)  # success only; failures retry next poll
            else:
                fails[name] = fails.get(name, 0) + 1
                log(f"eval {name} rc={rc} (fail {fails[name]}/"
                    f"{args.max_retries}); stderr tail: {stderr[-300:]}")
                rec["stderr_tail"] = stderr[-300:]
            with open(out_path, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            log("result:", {k: (round(v, 3) if isinstance(v, float) else v)
                            for k, v in rec.items() if k != "stderr_tail"})
        time.sleep(args.poll)


if __name__ == "__main__":
    main()
