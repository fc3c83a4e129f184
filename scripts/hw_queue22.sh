#!/bin/bash
# Stage-22: (a) SAME-SESSION remat A/B to rule on flipping the bench
# default — queue19 measured save_names selective remat at 15.76 im/s
# vs cross-session defaults of 14.93-15.03; only a back-to-back pair
# settles it. (b) sd15 sampler-scaling re-run now that the fused-GN
# scoped-VMEM gate models Mosaic's double-buffered io blocks (the
# queue21 leg died on a 16.05M>16M overflow at [32,1024,1920]).
# (c) first hardware numbers for the new DPM++ samplers.
# NO timeout on compiles: a wedged compile must be waited out, never
# killed (axon hazard, CLAUDE.md).
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue22 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}

# 1. Remat A/B, default first (also re-warms the driver's cache).
run bench22_default python bench.py
run bench22_remat_save_all env BENCH_REMAT=save_names:attn_out,ffn_out,resnet_out python bench.py

# 2. sd15 sampler scaling with the fixed GN gate (queue21 leg rc=1).
run sampler22_scaling_sd15 env SS_MODEL=sd15 SS_BATCHES=2,8,16,32 python scripts/sampler_scaling.py

# 3. New DPM++ samplers on the chip (sd15 bs=1, one compile each).
run bench22_dpmpp_samplers env BENCH_MODE=sample BENCH_MODEL=sd15 BENCH_SAMPLE_BS=1 BENCH_SAMPLER=dpmpp_2m_sde,dpmpp_sde,dpmpp_2s_ancestral,dpmpp_3m_sde python bench.py

touch hw_logs/stage22.done
log "QUEUE22 COMPLETE"
