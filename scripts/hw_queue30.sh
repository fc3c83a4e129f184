#!/bin/bash
# Stage-30 (round 4): final flash-aware profile (parser now resolves
# operands through the definition table) + nothing else.
set -u
cd /root/repo
log() { echo "[hw_queue30 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
m=hw_logs/.timing_probe_ok
if [ ! -f "$m" ]; then log "ABORT: no probe marker"; exit 3; fi
log "START profile30_default"
env TOPK=20 python scripts/step_profile.py > hw_logs/profile30_default.log 2>&1
log "DONE  profile30_default rc=$?"
touch hw_logs/stage30.done
log "QUEUE30 COMPLETE"
