#!/bin/bash
# Stage-37 (round 5, opportunistic): sd15@1024 re-measure with the
# exp2-softmax flash kernels (the VERDICT #2 target: >= 3.3 imgs/s or
# kernel-level proof), then the full-width bench-recipe stability leg.
set -u
cd /root/repo
log() { echo "[hw_queue37 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage36.done ]; do sleep 60; done

log "START bench37_sd15_1024"
env BENCH_MODEL=sd15 BENCH_LATENT=128 BENCH_BATCH=2 \
  BENCH_REMAT=save_names:attn_out,ffn_out,resnet_out \
  python bench.py > hw_logs/bench37_sd15_1024.log 2>&1
log "DONE  bench37_sd15_1024 rc=$?"

log "START conv_bf16sr_fullwidth"
env CONV_ARM=bf16sr CONV_SEED=0 CONV_STEPS=2000 CONV_WIDTH=1.0 \
  CONV_OUT=hw_logs/conv_bf16sr_s0.jsonl \
  python scripts/convergence_ab.py \
  > hw_logs/conv_bf16sr_s0.log 2>&1
log "DONE  conv_bf16sr_fullwidth rc=$?"

touch hw_logs/stage37.done
log "QUEUE37 COMPLETE"
