#!/bin/bash
# Stage-4: re-measure the micro-benchmarks with the probe-validated
# timer (utils/timing.py: value-fetch sync, discard-first, >=100ms
# chains, ULP perturbation), plus one rope_profile retry.
#
# No per-job `timeout`: killing a client mid-remote-compile has taken
# the whole axon relay down before (CLAUDE.md hazard) — a wedged job
# must be waited out. Marker FILE (not the append-only log) signals
# completion, so a future stage can gate on this launch specifically.
set -u
cd /root/repo
mkdir -p hw_logs
rm -f hw_logs/stage4.done
log() { echo "[hw_queue4 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }

run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  rc=$?
  log "DONE  $name rc=$rc"
}

run op_efficiency4 python scripts/op_efficiency.py
run xattn4_default python scripts/xattn_bench.py
run xattn4_on  env UWU_FLASH_XATTN=1 python scripts/xattn_bench.py
run xattn4_off env UWU_FLASH_XATTN=0 python scripts/xattn_bench.py
run rope_profile4 env BENCH_MODEL=sd15 BENCH_ROPE=1 python scripts/step_profile.py
run flash_tune4 python scripts/flash_tune.py --quick

touch hw_logs/stage4.done
log "QUEUE4 COMPLETE"
