#!/bin/bash
# Stage-36 (round 5, redesigned): convergence triangulation.
#  legs 1-2: control vs candidate default at a stable operating point
#            (lr 3e-5 + 100-step warmup), identical draws -> paired stats
#  legs 3-4: culprit isolation at the sharp point (lr 1e-4): bf16+SR
#            storage with FULL Adam (isolates storage) and fp32 storage
#            with factored+clip (isolates optimizer)
set -u
cd /root/repo
log() { echo "[hw_queue36 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage34.done ]; do sleep 60; done

run_leg() {
  local arm=$1 seed=$2 lr=$3 wu=$4 steps=$5 tag=$6
  log "START conv36_${tag}"
  env CONV_ARM=$arm CONV_SEED=$seed CONV_STEPS=$steps CONV_WIDTH=0.8 \
    CONV_LR=$lr CONV_WARMUP=$wu \
    CONV_OUT=hw_logs/conv36_${tag}.jsonl \
    python scripts/convergence_ab.py \
    > hw_logs/conv36_${tag}.log 2>&1
  log "DONE  conv36_${tag} rc=$?"
}

# post-fix legs (the lr-scaled weight-decay fix landed between the
# conv08 legs and these): leg 3 reruns the EXACT collapse conditions
# (same seed, same draws as conv08_bf16sr_clip_s0) with the fixed
# optimizer — the before/after proof
run_leg bf16sr_clip 0 1e-4 0 2000 bf16sr_clip_1e4_fixed
run_leg fp32 0 3e-5 100 1500 fp32_s0
run_leg bf16sr_clip 0 3e-5 100 1500 bf16sr_clip_s0

log "START convergence_report (final)"
env CONV_REPORT_PREFIX=conv36 python scripts/convergence_report.py \
  >> hw_logs/conv_report.log 2>&1
log "DONE  convergence_report rc=$?"
touch hw_logs/stage36.done
log "QUEUE36 COMPLETE"
