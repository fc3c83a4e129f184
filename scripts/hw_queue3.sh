#!/bin/bash
# Stage-3: first characterize the axon backend's sync/caching semantics
# (scripts/timing_probe.py), THEN re-run the micro-benchmarks — their
# earlier numbers were physically impossible twice (see utils/timing.py
# history), so the probe decides whether chained timing is trustworthy.
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

run timing_probe timeout 3600 python scripts/timing_probe.py

log "QUEUE3 COMPLETE (probe only — micro-bench reruns gated on probe findings)"
