#!/bin/bash
# Stage-21 (recovery #2): another VM restart wiped the compile cache
# and the queue19/20 logs (legs 1-4 of 19 had landed in ROUND3_NOTES
# before the restart). Re-warm the driver's headline bench first, then
# run the still-missing legs. NO timeout on compiles: a wedged compile
# must be waited out, never killed (axon hazard, CLAUDE.md).
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue21 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}

# 1. Headline default bench — re-warms the compile cache the driver
#    will hit at round end (cold SDXL compile ~30-55 min).
run bench21_default python bench.py

# 2. Flux-family first hardware numbers (lost queue20 legs).
run bench21_flux_train env BENCH_MODEL=flux_1b python bench.py
run bench21_flux_sample env BENCH_MODE=sample BENCH_MODEL=flux_1b BENCH_SAMPLE_BS=1 BENCH_SAMPLER=euler python bench.py

# 3. Sampler batch-scaling analysis (lost queue19/20 legs).
run sampler21_scaling_sd15 env SS_MODEL=sd15 SS_BATCHES=2,8,16,32 python scripts/sampler_scaling.py
run sampler21_scaling_sdxl env SS_MODEL=sdxl SS_BATCHES=2,4,8,16 python scripts/sampler_scaling.py

# 4. Full-mode adapter_bench leg (stage-15 remainder).
run adapter21_full env AB_MODEL=sd15 AB_BATCH=16 AB_LATENT=64 AB_MODES=full python scripts/adapter_bench.py

touch hw_logs/stage21.done
log "QUEUE21 COMPLETE"
