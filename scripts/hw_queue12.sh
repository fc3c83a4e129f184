#!/bin/bash
# Stage-12: int8 sampler A/B at SDXL scale — SD1.5's 1.7GB weights
# bounded the stage-8 win at ~4.5% (bs=1); SDXL streams 5.1GB bf16 per
# step, so the int8 delta should triple if the dequant stays fused.
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue12 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage11.done ]; do sleep 60; done
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}
run bench12_sdxl_sampler_fp env BENCH_MODE=sample BENCH_MODEL=sdxl BENCH_SAMPLE_BS=1 BENCH_SAMPLER=euler python bench.py
run bench12_sdxl_sampler_q8 env BENCH_MODE=sample BENCH_MODEL=sdxl BENCH_SAMPLE_BS=1 BENCH_SAMPLER=euler BENCH_QUANT=1 python bench.py
touch hw_logs/stage12.done
log "QUEUE12 COMPLETE"
