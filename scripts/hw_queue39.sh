#!/bin/bash
# Stage-39 (round 5): contingency — the 4096x64 roofline compile ran
# long; its python (pid written below) finishes or dies on its own.
# When it exits, hand off straight to the conv36 post-fix convergence
# legs (serve38 dropped for time; serve33's achieved_rps curve stands
# with the latency caveat).
set -u
cd /root/repo
log() { echo "[hw_queue39 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while ls /proc/19752/cmdline >/dev/null 2>&1; do sleep 30; done
log "roofline38_4096x64 python exited"
touch hw_logs/stage34.done
log "QUEUE39 COMPLETE (stage34 marker -> queue36 conv legs)"
