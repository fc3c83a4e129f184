#!/bin/bash
# Stage-29 (round 4): serving with the batch-size ladder (lone
# requests run bs=1 — single-latency check) + step_profile with the
# flash-FLOP-aware parser (true matmul numerator incl. Pallas calls).
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue29 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }

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

run serve29_sd15_ladder env SB_MODEL=sd15 SB_RES=512 SB_STEPS=16 SB_REQUESTS=32 SB_MAXBATCH=8 python scripts/serve_bench.py
run profile29_default env TOPK=20 python scripts/step_profile.py

touch hw_logs/stage29.done
log "QUEUE29 COMPLETE"
