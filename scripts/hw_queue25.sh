#!/bin/bash
# Stage-25 (round 4): the VERDICT r3 perf list.
#  0. timing probe — MUST pass; writes hw_logs/.timing_probe_ok, and
#     every later stage refuses to run without a fresh marker
#     (VERDICT r3 #8: no number lands through a broken-sync relay)
#  1. bench default — now selective remat (save_names:attn_out,ffn_out,
#     resnet_out), flipped after the bench24 A/B (+5.1%)
#  2. serving bench sd15 after the round-4 serving overhaul (jitted TE,
#     per-sample seeds out of the group key, u8 fetch, fetch overlap)
#  3. serving bench int8 leg (VERDICT asks for a re-run)
#  4. grad_norm-metric-off A/B (memory/step-time; VERDICT r3 weak #8)
#  5. bs=10 probe with the metric off (headroom check; OOM rc!=0 is an
#     acceptable answer)
# NO timeout on compiles (axon hazard: never kill a client mid-remote-
# compile, CLAUDE.md).
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue25 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }

require_probe() {
  # marker must exist and be <12h old (same session)
  m=hw_logs/.timing_probe_ok
  if [ ! -f "$m" ]; then log "ABORT $1: no timing-probe marker"; exit 3; fi
  age=$(( $(date +%s) - $(stat -c %Y "$m") ))
  if [ "$age" -gt 43200 ]; then log "ABORT $1: probe marker stale (${age}s)"; exit 3; fi
}

run() {
  name="$1"; shift
  require_probe "$name"
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}

log "START timing25_probe"
python scripts/timing_probe.py > hw_logs/timing25_probe.log 2>&1
rc=$?
log "DONE  timing25_probe rc=$rc"
if [ $rc -ne 0 ]; then log "PROBE FAILED — queue aborted"; exit 3; fi

run bench25_default python bench.py
run serve25_sd15 env SB_MODEL=sd15 SB_RES=512 SB_STEPS=16 SB_REQUESTS=32 SB_MAXBATCH=8 python scripts/serve_bench.py
run serve25_sd15_int8 env SB_MODEL=sd15 SB_RES=512 SB_STEPS=16 SB_REQUESTS=32 SB_MAXBATCH=8 SB_QUANT=1 python scripts/serve_bench.py
run bench25_gradnorm_off env BENCH_GRAD_NORM=0 python bench.py
run bench25_bs10_gnoff env BENCH_GRAD_NORM=0 BENCH_BATCH=10 python bench.py

touch hw_logs/stage25.done
log "QUEUE25 COMPLETE"
