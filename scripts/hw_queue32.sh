#!/bin/bash
# Stage-32 (round 5): convergence A/B at width-0.8 (~550M), the largest
# scale where the fp32 control fits 16GB (full-width fp32 OOM'd —
# conv_fp32_s0.log). Four legs: control, bench recipe, control seed-1
# (seed-noise scale), bench recipe + per-leaf clip. The full-width
# bf16sr stability leg ran in queue31.
set -u
cd /root/repo
log() { echo "[hw_queue32 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
m=hw_logs/.timing_probe_ok
if [ ! -f "$m" ] || [ -n "$(find "$m" -mmin +720)" ]; then
  log "ABORT: no fresh probe marker"; exit 3
fi

# wait for any still-running queue31 leg to release the chip
while ls /proc/28370/cmdline >/dev/null 2>&1; do
  log "waiting for queue31 leg (pid 28370) to finish"; sleep 60
done

run_leg() {
  local arm=$1 seed=$2
  log "START conv08_${arm}_s${seed}"
  env CONV_ARM=$arm CONV_SEED=$seed CONV_STEPS=2000 CONV_WIDTH=0.8 \
    CONV_OUT=hw_logs/conv08_${arm}_s${seed}.jsonl \
    python scripts/convergence_ab.py \
    > hw_logs/conv08_${arm}_s${seed}.log 2>&1
  log "DONE  conv08_${arm}_s${seed} rc=$?"
}

run_leg fp32 0
run_leg bf16sr 0
run_leg fp32 1
run_leg bf16sr_clip 0

touch hw_logs/stage32.done
log "QUEUE32 COMPLETE"
