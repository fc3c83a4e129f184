#!/bin/bash
# Stage-38 (round 5): re-prioritized tail — after the quiet default
# bench (running standalone; queue34's watcher was retired), run the
# rooflines and the fixed load-curve, then hand off to queue36's
# post-fix convergence legs. The second quiet GN-bwd leg and the
# conv08 fp32_s0 rerun are DROPPED for time; the GN-bwd A/B is
# reported from bench33_off vs bench34_quiet with the wd-fix confound
# noted.
set -u
cd /root/repo
log() { echo "[hw_queue38 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }

while ! grep -q '"metric"' hw_logs/bench34_default_quiet.log 2>/dev/null; do
  if grep -q "Traceback" hw_logs/bench34_default_quiet.log 2>/dev/null; then
    log "bench34_default_quiet FAILED"; break
  fi
  sleep 60
done
log "bench34_default_quiet observed"

log "START roofline38_16384x40"
python scripts/flash_roofline.py > hw_logs/roofline38_16384x40.log 2>&1
log "DONE  roofline38_16384x40 rc=$?"
log "START roofline38_4096x64"
env FR_SEQ=4096 FR_D=64 FR_HEADS=10 FR_BATCH=8 \
  python scripts/flash_roofline.py > hw_logs/roofline38_4096x64.log 2>&1
log "DONE  roofline38_4096x64 rc=$?"

log "START serve38_load_curve"
env SB_MODE=load_curve SB_MODEL=sd15 SB_RES=512 SB_STEPS=16 \
  SB_MAXBATCH=8 SB_REQUESTS=32 SB_MAXQ=16 \
  python scripts/serve_bench.py > hw_logs/serve38_load_curve.log 2>&1
log "DONE  serve38_load_curve rc=$?"

touch hw_logs/stage34.done
log "QUEUE38 COMPLETE (stage34 marker -> queue36 convergence legs)"
