#!/bin/bash
# Sequential hardware measurement queue (ROADMAP round-3 items).
# One job at a time on the single chip; logs to hw_logs/.
# NEVER kill this mid-compile (see CLAUDE.md axon hazard).
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }

run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  rc=$?
  log "DONE  $name rc=$rc"
}

# 1. numerics gate (fast-ish; includes the 2 new cross-attn cases)
run flash_check timeout 3600 python scripts/flash_check.py

# 2. cross-attn flash A/B (decides the Sq threshold)
run xattn_default timeout 3600 python scripts/xattn_bench.py
run xattn_on  env UWU_FLASH_XATTN=1 timeout 3600 python scripts/xattn_bench.py
run xattn_off env UWU_FLASH_XATTN=0 timeout 3600 python scripts/xattn_bench.py

# 3. headline bench (also warms the driver's compile cache; emits mfu_matmul)
run bench_default timeout 7200 python bench.py

# 4. 1024px bench (chunked-apply GN + 16384-seq flash path)
run bench_1024 env BENCH_LATENT=128 BENCH_BATCH=1 timeout 7200 python bench.py

# 5. MXU-efficiency gap
run op_efficiency timeout 3600 python scripts/op_efficiency.py

# 6. DiT family numbers
run bench_dit_moe env BENCH_MODEL=dit_moe_s_2_8e timeout 7200 python bench.py
run bench_dit_xl  env BENCH_MODEL=dit_xl_2 timeout 7200 python bench.py

log "QUEUE COMPLETE"
