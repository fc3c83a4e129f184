#!/bin/bash
# Stage-34 (round 5): re-run the conv08 fp32 control (its first launch
# raced the GN-bwd Mosaic fix and died at trace), then build the
# convergence report.
set -u
cd /root/repo
log() { echo "[hw_queue34 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage33.done ]; do sleep 60; done

# quiet re-measure of the default bench (the queue33 on-leg windows ran
# host-loaded: 9.7-15.3 spread, host_load_1m 1.31) — cache-warm now
log "START bench34_default_quiet"
python bench.py > hw_logs/bench34_default_quiet.log 2>&1
log "DONE  bench34_default_quiet rc=$?"

log "START bench34_gnbwd_off_quiet"
env UWU_FUSED_GN_BWD=0 python bench.py > hw_logs/bench34_gnbwd_off_quiet.log 2>&1
log "DONE  bench34_gnbwd_off_quiet rc=$?"

# roofline re-runs (queue33 legs hit a donated-buffer reuse bug, fixed)
log "START roofline34_16384x40"
python scripts/flash_roofline.py > hw_logs/roofline34_16384x40.log 2>&1
log "DONE  roofline34_16384x40 rc=$?"
log "START roofline34_4096x64"
env FR_SEQ=4096 FR_D=64 FR_HEADS=10 FR_BATCH=8 \
  python scripts/flash_roofline.py > hw_logs/roofline34_4096x64.log 2>&1
log "DONE  roofline34_4096x64 rc=$?"

# load-envelope rerun (serve33 measured observation latency, fixed)
log "START serve34_load_curve"
env SB_MODE=load_curve SB_MODEL=sd15 SB_RES=512 SB_STEPS=16 \
  SB_MAXBATCH=8 SB_REQUESTS=32 SB_MAXQ=16 \
  python scripts/serve_bench.py > hw_logs/serve34_load_curve.log 2>&1
log "DONE  serve34_load_curve rc=$?"

if ! grep -q '"summary"' hw_logs/conv08_fp32_s0.jsonl 2>/dev/null; then
  rm -f hw_logs/conv08_fp32_s0.jsonl
  log "START conv08_fp32_s0 (rerun)"
  env CONV_ARM=fp32 CONV_SEED=0 CONV_STEPS=2000 CONV_WIDTH=0.8 \
    CONV_OUT=hw_logs/conv08_fp32_s0.jsonl \
    python scripts/convergence_ab.py \
    > hw_logs/conv08_fp32_s0.log 2>&1
  log "DONE  conv08_fp32_s0 rc=$?"
fi

log "START convergence_report"
env CONV_REPORT_PREFIX=conv08 python scripts/convergence_report.py > hw_logs/conv_report.log 2>&1
log "DONE  convergence_report rc=$?"
touch hw_logs/stage34.done
log "QUEUE34 COMPLETE"
