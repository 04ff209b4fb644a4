#!/bin/bash
# Bench A/B for the r2->r3 regression analysis (VERDICT r2 #3/#7):
#   A: HEAD, widened tier batches (default 32,16,4,1)
#   B: HEAD, round-2 tier batches (8,8,4,1)
#   C: round-1 snapshot 62fa808 (pre uniform-width padded groups)
# Each config runs in its own process (axon re-execution bug: one hot
# executable per process) with BENCH_REPS=3 inside.
# Usage: bash scripts/bench_ab.sh [out_dir]
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
OUT=${1:-/tmp/bench_ab}
mkdir -p "$OUT"

run() { # name workdir extra_env...
  local name=$1 dir=$2; shift 2
  echo "=== $name (cwd=$dir) ==="
  (cd "$dir" && env "$@" \
     JAX_COMPILATION_CACHE_DIR="$REPO/.jax_cache" \
     timeout 3600 python bench.py > "$OUT/$name.json" 2> "$OUT/$name.log")
  echo "rc=$? -> $OUT/$name.json"
  tail -1 "$OUT/$name.json" 2>/dev/null
}

run A_head_tier32 "$REPO"
run B_head_tier8 "$REPO" AUTOINST_TIER_BATCHES=8,8,4,1

if [ ! -d /tmp/r1snap ]; then
  git -C "$REPO" worktree add /tmp/r1snap 62fa808 || exit 1
fi
run C_r1_snapshot /tmp/r1snap

echo "=== summary ==="
for f in "$OUT"/*.json; do echo "$f: $(tail -1 "$f")"; done
