#!/bin/bash
# Stage-27 (round 4): SDXL between-op gap ablations (VERDICT r3 #1).
# Each leg isolates one suspect share of the 519ms selective-remat
# step for the irreducibility accounting:
#  1. UWU_FUSED_GN=0 — is the fused-GN custom_vjp still the right
#     trade under SELECTIVE remat? (round-3 verdict was remat-specific)
#  2. UWU_FLASH_BLOCKS=2048,512 — third block-shape point in-step
#  3. step_profile compiled FOR TPU (warm cache) — per-group FLOPs +
#     true HBM traffic of the exact default program
# Requires a fresh timing-probe marker.
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue27 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }

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

run bench27_fusedgn_off env UWU_FUSED_GN=0 python bench.py
run bench27_blocks_2048_512 env UWU_FLASH_BLOCKS=2048,512 python bench.py
run profile27_default env TOPK=30 python scripts/step_profile.py

touch hw_logs/stage27.done
log "QUEUE27 COMPLETE"
