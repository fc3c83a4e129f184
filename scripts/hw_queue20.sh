#!/bin/bash
# Stage-20: Flux-family first hardware numbers (flux_1b — the
# single-chip-measurable scale point) + re-run of the sd15 sampler
# scaling leg that died on a relay broken-pipe in queue19.
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue20 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage19.done ]; do sleep 60; done
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}
run bench20_flux_train env BENCH_MODEL=flux_1b python bench.py
run bench20_flux_sample env BENCH_MODE=sample BENCH_MODEL=flux_1b BENCH_SAMPLE_BS=1 BENCH_SAMPLER=euler python bench.py
run sampler20_scaling_sd15 env SS_MODEL=sd15 SS_BATCHES=2,8,16,32 python scripts/sampler_scaling.py
# queue19's sdxl leg died shipping a 10.27GB constants-laden program
# through the relay (params were a closure capture; fixed to be a jit
# argument) — re-run with the fixed script
run sampler20_scaling_sdxl env SS_MODEL=sdxl SS_BATCHES=2,4,8,16 python scripts/sampler_scaling.py
touch hw_logs/stage20.done
log "QUEUE20 COMPLETE"
