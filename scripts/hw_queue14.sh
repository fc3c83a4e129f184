#!/bin/bash
# Stage-14: close the two stage-13 failures and validate the fixes.
# (a) adapter_bench full+controlnet with the sd15 no-remat default
#     UWU_FUSED_GN=0 (full leg OOMed with the fused-GN custom_vjp
#     residual pinning; controlnet leg gets its first number).
# (b) controlnet WITH fused GN: validates the scoped-VMEM chunk-shrink
#     fix (groupnorm_silu.py) compiles the [16,1024,1920] concat GN.
# (c) default SDXL bench re-run: the chunk shrink changes the GN
#     kernel inside the 15.9-im/s headline config (512 -> 256 rows at
#     the 1920-channel up-block shape) — confirm no regression.
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue14 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage13.done ]; do sleep 60; done
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}
run adapter14_full_cn env AB_MODEL=sd15 AB_BATCH=16 AB_LATENT=64 AB_MODES=full,controlnet python scripts/adapter_bench.py
run adapter14_cn_fusedgn env AB_MODEL=sd15 AB_BATCH=16 AB_LATENT=64 AB_MODES=controlnet AB_FUSED_GN=1 python scripts/adapter_bench.py
run bench14_sdxl_default python bench.py
touch hw_logs/stage14.done
log "QUEUE14 COMPLETE"
