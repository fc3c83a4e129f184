#!/bin/bash
# Stage-10: fused-RoPE HLO question (ROADMAP): does the model-level
# axial-RoPE rotation fuse into the flash kernel's operand input
# fusion, or does a rotated-q buffer materialize? The bs=16 no-remat
# attempt OOM'd (+6.4G); bs=8 + remat compiles the same fwd structure.
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue10 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage9.done ]; do sleep 60; done
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}
run rope10_profile env BENCH_MODEL=sd15 BENCH_ROPE=1 BENCH_BATCH=8 BENCH_REMAT=1 python scripts/step_profile.py
touch hw_logs/stage10.done
log "QUEUE10 COMPLETE"
