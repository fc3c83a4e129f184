#!/bin/bash
# Stage-19 (recovery): the VM restart killed queues 15-18 mid-flight.
# Re-run the lost legs, most valuable first. NO timeout on compiles:
# a wedged compile must be waited out, never killed (axon hazard,
# CLAUDE.md).
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue19 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}

# 1. Selective-remat A/B (stage-18): save attention/FF outputs, recompute glue.
run bench19_sdxl_save_attn_ffn env BENCH_REMAT=save_names:attn_out,ffn_out python bench.py
run bench19_sdxl_save_all env BENCH_REMAT=save_names:attn_out,ffn_out,resnet_out python bench.py

# 2. SD3-medium (2B MMDiT) first hardware numbers (stage-17).
run bench19_sd3_train env BENCH_MODEL=sd3_medium python bench.py
run bench19_sd3_sample env BENCH_MODE=sample BENCH_MODEL=sd3_medium BENCH_SAMPLE_BS=1 BENCH_SAMPLER=euler python bench.py

# 3. Sampler batch-scaling analysis (stage-16).
run sampler19_scaling_sd15 env SS_MODEL=sd15 SS_BATCHES=2,8,16,32 python scripts/sampler_scaling.py
run sampler19_scaling_sdxl env SS_MODEL=sdxl SS_BATCHES=2,4,8,16 python scripts/sampler_scaling.py

# 4. Full-mode adapter_bench leg (stage-15 remainder; per-leaf freeing fix).
run adapter19_full env AB_MODEL=sd15 AB_BATCH=16 AB_LATENT=64 AB_MODES=full python scripts/adapter_bench.py

# 5. Headline default bench to re-warm the driver cache post-restart.
run bench19_default python bench.py

touch hw_logs/stage15.done hw_logs/stage16.done hw_logs/stage17.done hw_logs/stage18.done hw_logs/stage19.done
log "QUEUE19 COMPLETE"
