#!/bin/bash
# Stage-36 (round 5): convergence A/B rerun at a stable-learning
# operating point (lr 3e-5, 100-step linear warmup) — the lr-1e-4
# no-warmup legs showed learn-then-collapse-to-mean dynamics in BOTH
# arms' regime (bf16sr measured; see conv08_* logs), which compares
# recipes only at a bad hyperparameter. 1500 steps per leg. Arm B is
# the CLIPPED recipe (the round-5 candidate default after the
# unclipped-factored collapse at lr 1e-4).
set -u
cd /root/repo
log() { echo "[hw_queue36 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage34.done ]; do sleep 60; done

run_leg() {
  local arm=$1 seed=$2
  log "START conv36_${arm}_s${seed}"
  env CONV_ARM=$arm CONV_SEED=$seed CONV_STEPS=1500 CONV_WIDTH=0.8 \
    CONV_LR=3e-5 CONV_WARMUP=100 \
    CONV_OUT=hw_logs/conv36_${arm}_s${seed}.jsonl \
    python scripts/convergence_ab.py \
    > hw_logs/conv36_${arm}_s${seed}.log 2>&1
  log "DONE  conv36_${arm}_s${seed} rc=$?"
}

run_leg fp32 0
run_leg bf16sr_clip 0
run_leg fp32 1

log "START convergence_report (final)"
env CONV_REPORT_PREFIX=conv36 python scripts/convergence_report.py \
  >> hw_logs/conv_report.log 2>&1
log "DONE  convergence_report rc=$?"
touch hw_logs/stage36.done
log "QUEUE36 COMPLETE"
