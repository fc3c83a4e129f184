#!/bin/bash
# Stage-13: (a) adapter-trainer throughput on the chip — LoRA / LoKr /
# ControlNet / IP-Adapter / textual-inversion trainers have only ever
# run on CPU fixtures; measure imgs/sec + trainable-param footprint at
# SD1.5@512 scale next to the full-fine-tune anchor.
# (b) XLA scoped-VMEM A/B: --xla_tpu_scoped_vmem_limit_kib raises the
# per-fusion VMEM budget — the one untried single-chip compiler lever
# (step is MXU-efficiency-bound BETWEEN ops; bigger fusion tiles may
# close some of the 59-85%-isolated vs 37%-in-step gap). New flag
# values force cold compiles (cache key) — sd15 first (cheap), sdxl
# only if sd15 shows a win.
set -u
cd /root/repo
mkdir -p hw_logs
log() { echo "[hw_queue13 $(date +%H:%M:%S)] $*" | tee -a hw_logs/queue.log; }
while [ ! -f hw_logs/stage12.done ]; do sleep 60; done
run() {
  name="$1"; shift
  log "START $name: $*"
  "$@" > "hw_logs/${name}.log" 2>&1
  log "DONE  $name rc=$?"
}
run adapter13_bench env AB_MODEL=sd15 AB_BATCH=16 AB_LATENT=64 python scripts/adapter_bench.py
run bench13_sd15_vmem32 env BENCH_MODEL=sd15 XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=32768 python bench.py
run bench13_sd15_vmem64 env BENCH_MODEL=sd15 XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 python bench.py
touch hw_logs/stage13.done
log "QUEUE13 COMPLETE"
