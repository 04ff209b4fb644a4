#!/bin/bash
# Multi-map self-training chain (generalization arm, VERDICT r3 #2).
#
# Trains ONE MaskPLS checkpoint on the merged-relabel chunks of SEVERAL
# synthetic maps (the flagship seed-42 map plus every extra map built by
# scripts/make_training_map.py), then evaluates that single checkpoint on
#   (a) the flagship map  -> .selftrain/refined.json
#   (b) the unseen holdout map 1042 -> .selftrain/refined_holdout.json
# This mirrors how the reference's self-training wins as a GENERALIZATION
# claim: the refiner segments arbitrary chunks (reference
# predict_maskpls.py:133-158), trained on pseudo-labels at scale
# (reference README.md:100), not on one memorized map.
#
# Idempotent like chain_r3b.sh: each phase is skipped when its artifact
# exists. Requires the extra maps' out_merged24 chunks to exist already.
set -e
cd /root/repo
mkdir -p .selftrain
L=.selftrain/chain_multi.log
log() { echo "[multi $(date +%H:%M:%S)] $*" >> "$L"; }

# assemble the multi-map training set: one symlinked sequence dir per map
MULTI=.selftrain/out_multi/train
mkdir -p "$MULTI"
i=0
for leaf in .selftrain/out_merged24/train/0 \
            .selftrain_map*/out_merged24/train/0; do
    if ls "$leaf"/*.npz >/dev/null 2>&1; then
        ln -sfn "$(readlink -f "$leaf")" "$MULTI/m$i"
        i=$((i+1))
    fi
done
n=$(find -L "$MULTI" -name '*.npz' | wc -l)
log "training set: $i maps, $n chunks"
if [ "$i" -lt 2 ]; then
    log "need at least 2 maps (flagship + one extra); aborting"
    exit 1
fi

# same validated recipe as ckpts_stable (stabilized matching + cosine);
# EPOCHS scales the step horizon to the larger set if not given. When the
# flagship single-map checkpoint exists, warm-start from it (params only,
# fresh optimizer) -- fine-tuning to the multi-map set needs a fraction of
# the from-scratch horizon.
EPOCHS=${EPOCHS:-120}
INIT=${INIT_FROM:-.selftrain/ckpts_stable/maskpls_last.ckpt}
extra=""
[ -f "$INIT" ] && extra="--init-from $INIT" && log "warm start: $INIT"
if [ ! -f .selftrain/ckpts_multi/maskpls_weights.msgpack ]; then
    log "phase train (multi-map, stable matching, cosine, $EPOCHS epochs)"
    python scripts/selftrain_demo.py train --data "$MULTI" \
        --ckpt-name ckpts_multi --no-aug --cache-batches 8 --eos-coef 0.1 \
        --batch-acc 1 --lr 5e-4 --schedule --warmup 100 --epochs "$EPOCHS" \
        --match-exact --match-joint $extra >> "$L" 2>&1
else
    log "phase train: weights exist, skipping"
fi

log "phase eval (flagship map)"
python scripts/selftrain_demo.py eval --ckpt-name ckpts_multi >> "$L" 2>&1
log "phase holdout (unseen map 1042, refined arm only)"
python scripts/selftrain_demo.py holdout --ckpt-name ckpts_multi \
    --skip-baseline >> "$L" 2>&1
log "chain done"
