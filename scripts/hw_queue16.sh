#!/bin/bash
# Stage-16: sampler batch-scaling analysis (VERDICT r2 weak #8) — one
# isolated CFG UNet forward per effective batch, achieved matmul
# TFLOP/s vs peak. Answers WHY per-image sampler cost bottoms at bs=4
# (CFG doubles the batch: bs=1/4/8 -> eff 2/8/16).
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue16 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage15.done ]; do sleep 60; done
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}
run sampler16_scaling_sd15 env SS_MODEL=sd15 SS_BATCHES=2,8,16,32 python scripts/sampler_scaling.py
run sampler16_scaling_sdxl env SS_MODEL=sdxl SS_BATCHES=2,4,8,16 python scripts/sampler_scaling.py
touch hw_logs/stage16.done
log "QUEUE16 COMPLETE"
