#!/bin/bash
# Stage-11: last cell of the sd15@512 regression 2x2 — the EXACT
# round-2 configuration (flash cross-attn + (512,2048) blocks), which
# produced the 30-34 imgs/s band. Completes:
#   XLA+new 28.34 | flash+new 27.51 | XLA+old 28.83 | flash+old ???
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue11 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage10.done ]; do sleep 60; done
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}
run bench11_sd15_round2cfg env BENCH_MODEL=sd15 UWU_FLASH_XATTN=1 UWU_FLASH_BLOCKS=512,2048 python bench.py
touch hw_logs/stage11.done
log "QUEUE11 COMPLETE"
