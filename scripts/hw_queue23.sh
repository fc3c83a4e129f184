#!/bin/bash
# Stage-23: bench22's train legs measured 10-step windows in ONE step's
# wall time (463% MFU) — the block_until_ready early-return trap
# (timing_probe, session 6) reappeared inside bench.py's own loop.
# bench/adapter_bench now use value-fetch sync. Re-diagnose the relay,
# re-run the remat A/B honestly, then first serving-layer numbers.
# NO timeout on compiles (axon hazard, CLAUDE.md).
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue23 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}

# wait for queue22 to finish (never run two TPU clients at once)
while [ ! -f hw_logs/stage22.done ]; do sleep 60; done

# 0. Probe the relay's sync semantics as they are TODAY.
run timing23_probe python scripts/timing_probe.py

# 1. Honest remat A/B (value-fetch sync), default first.
run bench23_default python bench.py
run bench23_remat_save_all env BENCH_REMAT=save_names:attn_out,ffn_out,resnet_out python bench.py

# 2. Serving layer: continuous batching at SD1.5@512, then int8.
run serve23_sd15 env SB_MODEL=sd15 SB_RES=512 SB_STEPS=16 SB_REQUESTS=32 SB_MAXBATCH=8 python scripts/serve_bench.py
run serve23_sd15_int8 env SB_MODEL=sd15 SB_RES=512 SB_STEPS=16 SB_REQUESTS=32 SB_MAXBATCH=8 SB_QUANT=1 python scripts/serve_bench.py

touch hw_logs/stage23.done
log "QUEUE23 COMPLETE"
