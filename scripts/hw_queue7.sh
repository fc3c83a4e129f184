#!/bin/bash
# Stage-7: (a) resolve the sd15@512 regression (28.3 vs the round-2
# 30-34 band) with IN-STEP A/Bs — flash-vs-XLA cross-attention and
# new-vs-old flash blocks are the two things that changed; (b) probe
# SDXL bs=10 (does the remat step fit above bs=8?).
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue7 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage6.done ]; do sleep 60; done
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}
# baseline for these A/Bs is bench5_sd15: 28.339 (XLA xattn, (1024,1024) table)
run bench7_sd15_flashxattn env BENCH_MODEL=sd15 UWU_FLASH_XATTN=1 python bench.py
run bench7_sd15_oldblocks env BENCH_MODEL=sd15 UWU_FLASH_BLOCKS=512,2048 python bench.py
run bench7_sdxl_bs10 env BENCH_BATCH=10 python bench.py
touch hw_logs/stage7.done
log "QUEUE7 COMPLETE"
