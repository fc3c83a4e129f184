#!/bin/bash
# Stage-35 (round 5): the full-width (860M) 2000-step stability leg of
# the exact bench recipe (bf16+SR, factored, no clip) — the queue31
# attempt raced the GN-bwd Mosaic fix. Same-scale stability evidence
# to pair with the width-0.8 comparative A/B.
set -u
cd /root/repo
log() { echo "[hw_queue35 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage34.done ]; do sleep 60; done

log "START conv_bf16sr_fullwidth"
env CONV_ARM=bf16sr CONV_SEED=0 CONV_STEPS=2000 CONV_WIDTH=1.0 \
  CONV_OUT=hw_logs/conv_bf16sr_s0.jsonl \
  python scripts/convergence_ab.py \
  > hw_logs/conv_bf16sr_s0.log 2>&1
log "DONE  conv_bf16sr_fullwidth rc=$?"

log "START convergence_report (refresh)"
python scripts/convergence_report.py >> hw_logs/conv_report.log 2>&1
log "DONE  convergence_report rc=$?"
touch hw_logs/stage35.done
log "QUEUE35 COMPLETE"
