#!/bin/bash
# Stage-3: re-run the jobs that executed before the memoization fix in
# utils/timing.py (perturbed inputs per timed run) landed.
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue3 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }

while ! grep -q "QUEUE2 COMPLETE" hw_logs/queue.log 2>/dev/null; do
  sleep 60
done

run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  rc=$?
  log "DONE  $name rc=$rc"
}

run op_efficiency3 timeout 3600 python scripts/op_efficiency.py
run xattn3_default timeout 3600 python scripts/xattn_bench.py
run xattn3_on env UWU_FLASH_XATTN=1 timeout 3600 python scripts/xattn_bench.py

log "QUEUE3 COMPLETE"
