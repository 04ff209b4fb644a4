#!/bin/bash
# Chain artifact persistence watcher (wipe recovery).
#
# The selftrain working set (.selftrain/, gitignored) has been destroyed
# by host-VM rebuilds three times this round, each time losing hours of
# TPU training. This watcher force-commits the EXPENSIVE chain artifacts
# into git as they complete, so a fresh host resumes the chain from the
# last phase / checkpoint instead of from scratch (chain_r3b.sh is
# idempotent per phase; phase_train resumes from the newest epoch ckpt
# with a pinned total horizon).
#
# Safety rule: a phase's outputs are committed only once the NEXT phase
# has appeared in chain.log -- chain_r3b.sh's skip tests are "any .npz
# exists", so restoring a HALF-written phase output would wrongly skip
# the phase. Checkpoints are committed only when their mtime is >20s old
# (save_checkpoint is not atomic). The 597M generated map is NOT
# persisted: `selftrain_demo.py gen` rebuilds it deterministically in
# under a minute.
set -u
cd /root/repo
L=.selftrain/chain.log

commit_if_changed() {  # commit_if_changed <message> <path...>
    git add -f "$@" 2>/dev/null || return
    if ! git diff --cached --quiet; then
        git commit -q -m "$1" || true
    fi
}

phase_started() { grep -q "phase $1" "$L" 2>/dev/null; }

while true; do
    # NOT persisted: out_export24 (143M) and out_refined_pseudoracle
    # (119M) -- both are consumed once out_merged24 exists, and the chain
    # skips their phases when the merged chunks are restored. Rebuild cost
    # if BOTH the working set and merged24 were lost: ~35 min (one device
    # export compile), vs. ~300M of permanent git history.
    if phase_started train; then
        commit_if_changed "Chain snapshot: merged-relabel training chunks" \
            .selftrain/out_merged24
    fi
    # during training: newest stable checkpoint + telemetry
    ck=$(ls -t .selftrain/ckpts_stable/maskpls_epoch*.ckpt 2>/dev/null | head -1)
    if [ -n "${ck:-}" ]; then
        age=$(( $(date +%s) - $(stat -c %Y "$ck") ))
        if [ "$age" -gt 20 ]; then
            commit_if_changed "Chain snapshot: $(basename "$ck")" "$ck" \
                .selftrain/ckpts_stable/train_log.jsonl \
                .selftrain/ckpts_stable/level_widths.json
        fi
    fi
    if [ -f .selftrain/ckpts_stable/maskpls_weights.msgpack ]; then
        commit_if_changed "Chain snapshot: final trained weights" \
            .selftrain/ckpts_stable/maskpls_weights.msgpack \
            .selftrain/ckpts_stable/maskpls_last.ckpt \
            .selftrain/ckpts_stable/train_log.jsonl
    fi
    if grep -q "chain done" "$L" 2>/dev/null; then
        commit_if_changed "Chain snapshot: chain.log (done)" "$L"
        # land refined.json into results/ iff the quality gates pass
        python scripts/land_refined.py || true
        exit 0
    fi
    sleep 60
done
