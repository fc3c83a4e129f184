#!/bin/bash
# Stage-2 hardware queue: re-measure everything whose earlier numbers
# used the broken dispatch-loop timing (see utils/timing.py), plus the
# fused-RoPE HLO check. Waits for the stage-1 queue to finish first.
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue2 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }

# wait for stage 1 (marker line in the shared log)
while ! grep -q "QUEUE COMPLETE" hw_logs/queue.log 2>/dev/null; do
  sleep 60
done

run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  rc=$?
  log "DONE  $name rc=$rc"
}

run op_efficiency2 timeout 3600 python scripts/op_efficiency.py
run xattn2_default timeout 3600 python scripts/xattn_bench.py
run xattn2_on  env UWU_FLASH_XATTN=1 timeout 3600 python scripts/xattn_bench.py
run xattn2_off env UWU_FLASH_XATTN=0 timeout 3600 python scripts/xattn_bench.py
run flash_tune2 timeout 7200 python scripts/flash_tune.py

# fused-RoPE HLO check: does the rotated q materialize as its own
# buffer, or does XLA fuse the rotation into the kernel-operand fusion?
run rope_profile env BENCH_MODEL=sd15 BENCH_ROPE=1 timeout 7200 python scripts/step_profile.py

log "QUEUE2 COMPLETE"
