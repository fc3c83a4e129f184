#!/bin/bash
# Stage-33 (round 5): perf legs after the convergence A/B.
#  1. SDXL bench default with the NEW Pallas GN backward (cold compile;
#     also warms the cache for the driver's end-of-round bench)
#  2. same program with UWU_FUSED_GN_BWD=0 (round-4 XLA-autodiff bwd,
#     should be cache-hot) — the bench24-style same-session A/B
#  3. flash roofline: 16384x40 (the sd15@1024 wall) + 4096x64 (SDXL)
#  4. serving load envelope (sd15 512px, Poisson open-loop levels)
#  5. sd15 continuity bench (new bwd; no fused GN there so expect noise)
set -u
cd /root/repo
log() { echo "[hw_queue33 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
m=hw_logs/.timing_probe_ok
if [ ! -f "$m" ] || [ -n "$(find "$m" -mmin +720)" ]; then
  log "ABORT: no fresh probe marker"; exit 3
fi
while [ ! -f hw_logs/stage32.done ]; do sleep 60; done
# round-5 manual gate: bench defaults may change based on the
# bf16sr_clip convergence leg (clipping_threshold adoption) — wait for
# the analysis marker so the expensive SDXL compile measures the
# adopted default
while [ ! -f hw_logs/.q33_go ]; do sleep 30; done

log "START bench33_default_gnbwd_on"
python bench.py > hw_logs/bench33_gnbwd_on.log 2>&1
log "DONE  bench33_default_gnbwd_on rc=$?"

log "START bench33_gnbwd_off"
env UWU_FUSED_GN_BWD=0 python bench.py > hw_logs/bench33_gnbwd_off.log 2>&1
log "DONE  bench33_gnbwd_off rc=$?"

log "START flash_roofline_16384x40"
python scripts/flash_roofline.py > hw_logs/roofline33_16384x40.log 2>&1
log "DONE  flash_roofline_16384x40 rc=$?"

log "START flash_roofline_4096x64"
env FR_SEQ=4096 FR_D=64 FR_HEADS=10 FR_BATCH=8 \
  python scripts/flash_roofline.py > hw_logs/roofline33_4096x64.log 2>&1
log "DONE  flash_roofline_4096x64 rc=$?"

log "START serve33_load_curve"
env SB_MODE=load_curve SB_MODEL=sd15 SB_RES=512 SB_STEPS=16 \
  SB_MAXBATCH=8 SB_REQUESTS=32 \
  python scripts/serve_bench.py > hw_logs/serve33_load_curve.log 2>&1
log "DONE  serve33_load_curve rc=$?"

log "START bench33_sd15"
env BENCH_MODEL=sd15 python bench.py > hw_logs/bench33_sd15.log 2>&1
log "DONE  bench33_sd15 rc=$?"

touch hw_logs/stage33.done
log "QUEUE33 COMPLETE"
