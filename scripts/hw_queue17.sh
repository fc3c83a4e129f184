#!/bin/bash
# Stage-17: SD3-medium (2B MMDiT, true scale) first hardware numbers.
# (a) train bench at the SDXL memory recipe (bs=8, remat, factored
#     AdamW, bf16+SR params) — the config-overlay commit made the
#     architecture runnable; this measures it.
# (b) sampler bench bs=1 euler via the new RFDenoiser path.
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue17 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage16.done ]; do sleep 60; done
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}
run bench17_sd3_train env BENCH_MODEL=sd3_medium python bench.py
run bench17_sd3_sample env BENCH_MODE=sample BENCH_MODEL=sd3_medium BENCH_SAMPLE_BS=1 BENCH_SAMPLER=euler python bench.py
touch hw_logs/stage17.done
log "QUEUE17 COMPLETE"
