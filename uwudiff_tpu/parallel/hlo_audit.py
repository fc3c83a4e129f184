"""Collective audit of compiled GSPMD programs.

The scale-out performance model (``scripts/parallel_perf_model.py``)
predicts WHICH collectives each mesh axis should generate and how many
bytes they move. This module extracts the ground truth from a compiled
module's HLO text so tests can assert the two agree — catching sharding
regressions (a stray all-to-all or an unexpected full-param all-gather
from a bad ``PartitionSpec``) that loss-parity tests cannot see, since
resharding is numerically invisible.

The reference delegates all communication to NCCL-under-Lightning
(SURVEY.md §2.4) and has no analogue; this is TPU-native observability
for the GSPMD compilation model.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

__all__ = [
    "CollectiveSummary",
    "collective_summary",
    "COLLECTIVE_OPS",
    "EXPECTED_OP_CLASSES",
    "allowed_ops",
]

COLLECTIVE_OPS = (
    "all-gather",
    "reduce-scatter",
    "all-reduce",
    "all-to-all",
    "collective-permute",
)

# Structural prediction: which collective op classes each mesh axis is
# ALLOWED to generate in a compiled train step (the audit counterpart
# of scripts/parallel_perf_model.py's cost formulas; measured ground
# truth on the 8-device virtual mesh, tests/test_hlo_collectives.py).
# - data: gradient/metric reductions only.
# - fsdp: param gathers + grad reductions. GSPMD may gather LESS than
#   the param bytes (partial-conv + activation reduction beats weight
#   gathers for small convs).
# - tensor: Megatron all-reduces + all-to-alls (the head_parallel
#   island reshards hidden<->head, and a2a is GSPMD's cheap lowering
#   for moving a sharded axis) + permutes.
# - seq: the K/V ring rides collective-permute.
# - pipe: stage-boundary collective-permute.
# - expert: dispatch lowers as gather+reduce (NOT all-to-all — the
#   perf model's a2a formula is the manual-dispatch upper bound).
EXPECTED_OP_CLASSES = {
    "data": {"all-reduce", "reduce-scatter", "all-gather"},
    "fsdp": {"all-gather", "all-reduce", "reduce-scatter"},
    "tensor": {"all-reduce", "all-to-all", "collective-permute",
               "all-gather", "reduce-scatter"},
    "seq": {"collective-permute", "all-reduce", "all-gather",
            "reduce-scatter"},
    "pipe": {"collective-permute", "all-reduce", "all-gather",
             "reduce-scatter"},
    "expert": {"all-gather", "all-reduce", "reduce-scatter"},
}


def allowed_ops(mesh_axes) -> set:
    """Union of op classes the given mesh axes may generate."""
    out = set()
    for axis in mesh_axes:
        out |= EXPECTED_OP_CLASSES.get(axis, set(COLLECTIVE_OPS))
    return out


_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
    "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
    "f64": 8, "c64": 8, "c128": 16,
}

# `%x = bf16[8,64,320]{2,1,0} all-gather(...)` — also matches the
# async pair's `-start` form and tuple-shaped variadic results
_INSTR = re.compile(
    r"=\s*(?P<shape>\(?[a-z0-9]+\[[^=]*?)\s*"
    r"(?P<op>" + "|".join(COLLECTIVE_OPS) + r")(?:-start)?\("
)
_SHAPE = re.compile(r"(?P<dtype>[a-z0-9]+)\[(?P<dims>[0-9,]*)\]")


def _shape_bytes(shape_text: str) -> int:
    total = 0
    for m in _SHAPE.finditer(shape_text):
        dtype = m.group("dtype")
        if dtype not in _BYTES:
            continue
        n = 1
        dims = m.group("dims")
        for d in dims.split(",") if dims else []:
            n *= int(d)
        total += n * _BYTES[dtype]
    return total


@dataclass
class CollectiveSummary:
    """Per-op instruction counts and result bytes of one HLO module."""

    counts: dict = field(default_factory=dict)
    bytes: dict = field(default_factory=dict)

    def count(self, op: str) -> int:
        return self.counts.get(op, 0)

    def total_bytes(self, op: str) -> int:
        return self.bytes.get(op, 0)

    def ops(self) -> set:
        return {op for op, c in self.counts.items() if c}

    def __repr__(self):
        parts = [
            f"{op}: n={self.counts[op]} bytes={self.bytes[op]:,}"
            for op in sorted(self.counts)
        ]
        return "CollectiveSummary(" + "; ".join(parts) + ")"


def collective_summary(hlo_text: str) -> CollectiveSummary:
    """Count collective instructions and sum their RESULT bytes.

    Works on ``compiled.as_text()`` (optimized HLO, post-GSPMD
    partitioning — the program the devices actually run). Async
    collectives are counted once via their ``-start`` instruction; the
    matching ``-done`` has no operator name of its own in optimized HLO
    dumps (it appears as ``all-gather-done``, which the start-form
    regex does not match because of the required ``(`` right after the
    optional ``-start`` suffix — ``-done(`` fails the alternation).
    """
    s = CollectiveSummary()
    for line in hlo_text.splitlines():
        if "-done(" in line:  # async completion: already counted at start
            continue
        m = _INSTR.search(line)
        if not m:
            continue
        op = m.group("op")
        s.counts[op] = s.counts.get(op, 0) + 1
        s.bytes[op] = s.bytes.get(op, 0) + _shape_bytes(m.group("shape"))
    return s
