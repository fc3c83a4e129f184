#!/bin/bash
# Stage-15: validate the io-capped fused-GN gate (b2b0e41) on hardware.
# bench14 ran the intermediate (no-io-cap) gate and was expected to hit
# the [.,4096,640] scoped-VMEM overflow; this re-runs the SDXL default
# bench and the fused-GN controlnet leg on the fixed gate, plus a clean
# (uncontended) full-mode window — the stage-14 full-mode trial spread
# (6.9-28.2) was contaminated by a concurrent client on the chip.
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue15 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage14.done ]; do sleep 60; done
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}
run bench15_sdxl_default python bench.py
run adapter15_cn_fusedgn env AB_MODEL=sd15 AB_BATCH=16 AB_LATENT=64 AB_MODES=controlnet AB_FUSED_GN=1 python scripts/adapter_bench.py
run adapter15_full env AB_MODEL=sd15 AB_BATCH=16 AB_LATENT=64 AB_MODES=full python scripts/adapter_bench.py
touch hw_logs/stage15.done
log "QUEUE15 COMPLETE"
