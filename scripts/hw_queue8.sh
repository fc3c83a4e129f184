#!/bin/bash
# Stage-8: int8 weight-only serving A/B (does the in-loop dequant stay
# int8-streamed or get LICM-hoisted to bf16? steps/sec decides).
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue8 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage7.done ]; do sleep 60; done
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}
run bench8_sampler_fp env BENCH_MODE=sample BENCH_MODEL=sd15 BENCH_SAMPLE_BS=1,4 BENCH_SAMPLER=euler python bench.py
run bench8_sampler_q8 env BENCH_MODE=sample BENCH_MODEL=sd15 BENCH_SAMPLE_BS=1,4 BENCH_SAMPLER=euler BENCH_QUANT=1 python bench.py
touch hw_logs/stage8.done
log "QUEUE8 COMPLETE"
