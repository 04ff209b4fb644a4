#!/bin/bash
# Round-3 selftrain regeneration chain (the VM restart wiped .selftrain/).
# Reproduces the merged-relabel memorization run end-to-end:
#   gen -> device export (overlap 24) -> pseudo-oracle merged map ->
#   relabel -> 400-epoch TPU train -> refined eval.
# Logs to .selftrain/chain.log; each phase is resumable via its artifacts.
set -e
cd /root/repo
mkdir -p .selftrain
L=.selftrain/chain.log
log() { echo "[chain $(date +%H:%M:%S)] $*" >> "$L"; }

log "phase gen"
python scripts/selftrain_demo.py gen >> "$L" 2>&1

log "phase export (device, overlap 24)"
python scripts/selftrain_demo.py export --device --overlap 24 \
    --out out_export24 >> "$L" 2>&1

log "phase pseudoracle (merged map)"
python scripts/eval_oracle.py --source pseudo --tag pseudoracle >> "$L" 2>&1

log "phase relabel"
python scripts/relabel_from_merged.py \
    --merged .selftrain/out_refined_pseudoracle/0/maskpls_tarl_spatial_0_0.pcd \
    >> "$L" 2>&1

log "phase train (merged targets, 400 epochs, no-aug, 8 draws)"
python scripts/selftrain_demo.py train --data .selftrain/out_merged24/train \
    --ckpt-name ckpts_merged --no-aug --cache-batches 8 --eos-coef 0.1 \
    --batch-acc 1 --lr 1e-4 --epochs 400 >> "$L" 2>&1

log "phase eval"
python scripts/selftrain_demo.py eval --ckpt-name ckpts_merged >> "$L" 2>&1
log "chain done"
