#!/bin/bash
# Stage-5: numerics gate at the new block sizes, then re-bench the
# configs the cross-attn gate revert should speed up, then the full
# block sweep. No per-job timeout (kill-mid-compile hazard).
set -u
cd /root/repo
mkdir -p hw_logs
rm -f hw_logs/stage5.done
log() { echo "[hw_queue5 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}

run flash_check5 python scripts/flash_check.py
run bench5_default python bench.py
run bench5_sd15 env BENCH_MODEL=sd15 python bench.py
run bench5_sdxl1024 env BENCH_LATENT=128 BENCH_BATCH=1 python bench.py
run bench5_sd15_1024 env BENCH_MODEL=sd15 BENCH_LATENT=128 BENCH_BATCH=4 python bench.py
run flash_tune5 python scripts/flash_tune.py

touch hw_logs/stage5.done
log "QUEUE5 COMPLETE"
