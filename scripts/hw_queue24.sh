#!/bin/bash
# Stage-24: VM restart killed queue22 mid sampler-scaling and queue23
# never started. Re-run the lost legs with the value-fetch-sync bench:
#  0. timing probe — relay sync semantics after the restart
#  1. bench default (honest baseline for the remat A/B; warms driver cache)
#  2. remat save_all A/B (rule on flipping the bench default)
#  3. sd15 sampler scaling (queue22's lost leg)
#  4. serving bench sd15 + int8 (first continuous-batching numbers)
# NO timeout on compiles (axon hazard, CLAUDE.md).
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue24 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}

run timing24_probe python scripts/timing_probe.py
run bench24_default python bench.py
run bench24_remat_save_all env BENCH_REMAT=save_names:attn_out,ffn_out,resnet_out python bench.py
run sampler24_scaling_sd15 env SS_MODEL=sd15 SS_BATCHES=2,8,16,32 python scripts/sampler_scaling.py
run serve24_sd15 env SB_MODEL=sd15 SB_RES=512 SB_STEPS=16 SB_REQUESTS=32 SB_MAXBATCH=8 python scripts/serve_bench.py
run serve24_sd15_int8 env SB_MODEL=sd15 SB_RES=512 SB_STEPS=16 SB_REQUESTS=32 SB_MAXBATCH=8 SB_QUANT=1 python scripts/serve_bench.py

touch hw_logs/stage24.done
log "QUEUE24 COMPLETE"
