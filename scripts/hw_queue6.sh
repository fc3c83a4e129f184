#!/bin/bash
# Stage-6: sd15@1024px re-bench with the two-sided cross-attn gate.
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue6 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage5.done ]; do sleep 60; done
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}
run bench6_sd15_1024 env BENCH_MODEL=sd15 BENCH_LATENT=128 BENCH_BATCH=4 python bench.py
touch hw_logs/stage6.done
log "QUEUE6 COMPLETE"
