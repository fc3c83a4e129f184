#!/bin/bash
# Stage-31 (round 5): convergence A/B proving the bench-default recipe
# trains (VERDICT r4 missing #1). Four sequential legs on the real
# chip; identical data order + per-step draws across arms; the seed-1
# fp32 leg measures seed-to-seed noise (reuses the fp32 compile).
set -u
cd /root/repo
log() { echo "[hw_queue31 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }

log "probe already fresh (skipping re-run)" #
# probe ran in the previous attempt

m=hw_logs/.timing_probe_ok
if [ ! -f "$m" ] || [ -n "$(find "$m" -mmin +720)" ]; then
  log "ABORT: no fresh probe marker"; exit 3
fi

run_leg() {
  local arm=$1 seed=$2
  log "START conv_${arm}_s${seed}"
  env CONV_ARM=$arm CONV_SEED=$seed CONV_STEPS=2000 \
    python scripts/convergence_ab.py \
    > hw_logs/conv_${arm}_s${seed}.log 2>&1
  log "DONE  conv_${arm}_s${seed} rc=$?"
}

run_leg fp32 0
run_leg bf16sr 0
run_leg fp32 1
run_leg bf16sr_clip 0

touch hw_logs/stage31.done
log "QUEUE31 COMPLETE"
