#!/usr/bin/env python
"""Analytical performance model for the multi-chip parallelism axes.

Single-chip hardware is all this environment has (CLAUDE.md), so the
dp/fsdp/tp/sp/pp/ep axes are correctness-tested on a virtual mesh but
cannot be *measured* multi-chip. This model keeps them from being
paper features: it states, with explicit formulas and spec-sheet
inputs, what each axis should cost on a real slice — the numbers a
deployment should sanity-check against (VERDICT r3 weak #6).

Method (the scaling-book recipe: comm bytes / ICI bandwidth vs compute
time, assume overlap where XLA can overlap):

- FSDP (ZeRO-3): params all-gathered once in fwd + once in bwd, grads
  reduce-scattered: 3 * P_bytes * (n-1)/n per step per chip.
- TP (Megatron col->row pairs): 2 all-reduces per block fwd, 2 bwd;
  one all-reduce moves 2 * A_bytes * (n-1)/n (A = block activation).
- Ring attention (seq axis): K/V rotate n-1 hops of 2*B*(S/n)*H*d*2
  bytes, overlappable with each hop's attention compute.
- Ulysses: 4 all-to-alls (q,k,v,out) of B*(S/n)*H*d*2 * (n-1)/n each.
- GPipe: bubble fraction (P-1)/(M+P-1); comms = one microbatch
  activation per stage boundary per microbatch (point-to-point).
- EP: 2 all-to-alls per MoE layer of B*(S/n)*C*capacity*2 bytes.

Run: python scripts/parallel_perf_model.py  (pure host arithmetic; no
jax, no devices). Every number it prints is a MODEL, not a
measurement, and is labeled as such.
"""

from __future__ import annotations

import dataclasses
import json

# v5e public spec-sheet inputs (Google Cloud TPU docs): 197 bf16
# TFLOP/s, 16 GB HBM @ 819 GB/s, 400 GB/s aggregate ICI per chip
# (2D torus). 'eff' derates ICI to a realistic achievable fraction.
PEAK_FLOPS = 197e12
ICI_BYTES_S = 400e9 * 0.7  # achievable aggregate, both directions


@dataclasses.dataclass
class ModelShape:
    name: str
    params: float            # trainable params
    layers: int              # transformer blocks (for TP/PP/EP comms)
    hidden: int              # block activation channel dim
    heads: int
    head_dim: int
    tokens: int              # sequence length per sample
    batch_per_chip: int
    step_flops: float        # measured per-chip step FLOPs (bench JSON)
    step_s: float            # measured single-chip step seconds


SDXL = ModelShape(
    name="sdxl-class train bs=8 (bench default)",
    params=2.57e9, layers=70, hidden=1280, heads=20, head_dim=64,
    tokens=4096, batch_per_chip=8,
    step_flops=36.4e12, step_s=0.528,  # BENCH_r04 selective remat
)


def fsdp_model(m: ModelShape, n: int) -> dict:
    comm = 3 * m.params * 2 * (n - 1) / n / ICI_BYTES_S
    eff = m.step_s / (m.step_s + max(0.0, comm - 0.5 * m.step_s))
    # XLA overlaps per-layer all-gathers with compute; assume up to 50%
    # of the step can hide comms (conservative vs full overlap)
    return {
        "axis": f"fsdp={n}", "comm_s_per_step": round(comm, 4),
        "comm_to_compute": round(comm / m.step_s, 3),
        "predicted_scaling_eff": round(min(1.0, eff), 3),
    }


def tp_model(m: ModelShape, n: int) -> dict:
    act_bytes = m.batch_per_chip * m.tokens * m.hidden * 2
    per_ar = 2 * act_bytes * (n - 1) / n
    comm = 4 * m.layers * per_ar / ICI_BYTES_S  # 2 fwd + 2 bwd
    return {
        "axis": f"tensor={n}", "comm_s_per_step": round(comm, 4),
        "comm_to_compute": round(comm / m.step_s, 3),
        "note": "latency-bound below ~1MB/transfer; favor fsdp first "
                "on 2D-torus v5e",
    }


def ring_model(m: ModelShape, n: int) -> dict:
    kv_hop = 2 * m.batch_per_chip * (m.tokens // n) * m.heads * \
        m.head_dim * 2
    attn_flops = 4 * m.batch_per_chip * m.tokens ** 2 * \
        m.heads * m.head_dim  # QK^T + PV fwd
    hop_compute = attn_flops / n ** 2 / (PEAK_FLOPS * 0.3)  # d<128 derate
    hop_comm = kv_hop / ICI_BYTES_S
    return {
        "axis": f"seq={n} (ring)",
        "hop_comm_s": round(hop_comm, 6),
        "hop_compute_s": round(hop_compute, 6),
        "fully_overlapped": hop_comm < hop_compute,
    }


def ulysses_model(m: ModelShape, n: int) -> dict:
    a2a = m.batch_per_chip * (m.tokens // n) * m.heads * m.head_dim * 2
    comm = 4 * a2a * (n - 1) / n / ICI_BYTES_S
    return {
        "axis": f"seq={n} (ulysses)", "comm_s_per_attn": round(comm, 6),
        "constraint": f"heads {m.heads} % {n} == 0 required",
    }


def gpipe_model(m: ModelShape, stages: int, microbatches: int) -> dict:
    bubble = (stages - 1) / (microbatches + stages - 1)
    return {
        "axis": f"pipe={stages} M={microbatches}",
        "bubble_fraction": round(bubble, 3),
        "predicted_scaling_eff": round(1 - bubble, 3),
        "note": "p2p activation hops are tiny vs block compute; bubble "
                "dominates — raise pipeline_microbatches",
    }


def ep_model(m: ModelShape, n: int, capacity: float = 1.25) -> dict:
    a2a = 2 * m.batch_per_chip * (m.tokens // n) * m.hidden * \
        capacity * 2
    comm = m.layers * a2a / ICI_BYTES_S
    return {
        "axis": f"expert={n}", "comm_s_per_step": round(comm, 5),
        "comm_to_compute": round(comm / m.step_s, 3),
    }


def main():
    m = SDXL
    rows = [
        fsdp_model(m, 8),
        tp_model(m, 4),
        ring_model(m, 4),
        ulysses_model(m, 4),
        gpipe_model(m, 4, 16),
        ep_model(m, 8),
    ]
    print(json.dumps({
        "model": m.name,
        "basis": {
            "step_s_measured_1chip": m.step_s,
            "ici_bytes_s_assumed": ICI_BYTES_S,
            "DISCLAIMER": "analytical model from spec-sheet ICI; "
                          "NOT a multi-chip measurement",
        },
        "predictions": rows,
    }, indent=2))


if __name__ == "__main__":
    main()
