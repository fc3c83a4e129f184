#!/bin/bash
# Stage-9: corrected sd15@1024 re-bench — stages 5/6 ran it WITHOUT
# remat (the sd15 bench default), which OOMs at 128x128 latents on both
# cross-attn routes (XLA +2.38G, flash +1.93G over 15.75G). The round-3
# 3.0 imgs/s measurement used remat; re-measure with BENCH_REMAT=1 and
# the two-sided xattn gate.
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue9 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage8.done ]; do sleep 60; done
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}
run bench9_sd15_1024_remat env BENCH_MODEL=sd15 BENCH_LATENT=128 BENCH_BATCH=4 BENCH_REMAT=1 python bench.py
touch hw_logs/stage9.done
log "QUEUE9 COMPLETE"
