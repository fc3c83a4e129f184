#!/bin/bash
# Stage-28 (round 4): re-probe + the voided sdxl@1024 leg + a
# quiet-host default re-measure (the bench25/26 session ran under a
# concurrent full-test load; this stage should run with the host idle).
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue28 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }

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

log "START timing28_probe"
python scripts/timing_probe.py > hw_logs/timing28_probe.log 2>&1
rc=$?
log "DONE  timing28_probe rc=$rc"
if [ $rc -ne 0 ]; then log "PROBE FAILED — queue aborted"; exit 3; fi

run bench28_default python bench.py
run bench28_sdxl_1024 env BENCH_LATENT=128 BENCH_BATCH=1 python bench.py

touch hw_logs/stage28.done
log "QUEUE28 COMPLETE"
