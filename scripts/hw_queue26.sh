#!/bin/bash
# Stage-26 (round 4): long-seq legs + SDXL between-op forensics.
#  1. sd15@1024 selective remat (round-3: 2.94-3.0 full remat)
#  2. sdxl@1024 bs=1 with the new selective-remat default (was 2.1)
#  3. SDXL default + (512,2048) flash blocks IN-STEP A/B
#  4. SDXL default with BENCH_OPT=sgd — diagnostic: how much of the
#     528ms step is adamw_factored + bf16-SR param updates?
#  5. serving phase breakdown (SB_PHASES=1; warm after serve25)
#  6. sd15 sampler bs=16 phase profile via serve-phases at bs=16
# Requires a fresh timing-probe marker (queue25 wrote it).
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue26 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }

require_probe() {
  m=hw_logs/.timing_probe_ok
  if [ ! -f "$m" ]; then log "ABORT $1: no timing-probe marker"; exit 3; fi
  age=$(( $(date +%s) - $(stat -c %Y "$m") ))
  if [ "$age" -gt 43200 ]; then log "ABORT $1: probe marker stale (${age}s)"; exit 3; fi
}

run() {
  name="$1"; shift
  require_probe "$name"
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}

run bench26_sd15_1024_selremat env BENCH_MODEL=sd15 BENCH_LATENT=128 BENCH_BATCH=4 BENCH_REMAT=save_names:attn_out,ffn_out,resnet_out python bench.py
run bench26_sdxl_1024 env BENCH_LATENT=128 BENCH_BATCH=1 python bench.py
run bench26_blocks_5122048 env UWU_FLASH_BLOCKS=512,2048 python bench.py
run bench26_opt_sgd env BENCH_OPT=sgd python bench.py
run serve26_phases env SB_MODEL=sd15 SB_RES=512 SB_STEPS=16 SB_MAXBATCH=8 SB_PHASES=1 python scripts/serve_bench.py
run serve26_phases_bs16 env SB_MODEL=sd15 SB_RES=512 SB_STEPS=16 SB_MAXBATCH=16 SB_PHASES=1 python scripts/serve_bench.py

touch hw_logs/stage26.done
log "QUEUE26 COMPLETE"
