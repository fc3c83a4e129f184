#!/bin/bash
# Stage-18: named-checkpoint selective remat A/B on the SDXL headline
# config. Full-block remat recomputes every attention+FF chain in the
# backward pass; the save_names policy keeps the [B,S,C]-sized
# attention/FF (and optionally resnet) outputs and recomputes only the
# cheap glue. Memory cost ~1.5GB at bs=8 (vs bs=10 fitting) — the bet
# is a measurable step-time cut at no OOM. NO timeout: a wedged compile
# must be waited out, never killed (axon relay hazard, CLAUDE.md).
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue18 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage17.done ]; do sleep 60; done
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}
run bench18_sdxl_save_attn_ffn env BENCH_REMAT=save_names:attn_out,ffn_out python bench.py
run bench18_sdxl_save_all env BENCH_REMAT=save_names:attn_out,ffn_out,resnet_out python bench.py
touch hw_logs/stage18.done
log "QUEUE18 COMPLETE"
