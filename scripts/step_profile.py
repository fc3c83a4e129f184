#!/usr/bin/env python
"""Static roofline profile of the benchmark train step from its
compiled HLO.

``jax.profiler`` traces are impractical over the tunneled single-chip
link (ROADMAP), but the optimized HLO of the compiled step carries
everything a first-order perf analysis needs: every ``convolution`` /
``dot`` instruction with shapes, plus JAX-level ``op_name`` metadata for
attribution. This tool compiles the EXACT benchmark program (reusing
``bench.build_trainer_and_batch``, warm via the persistent compile
cache), walks the HLO text, computes per-instruction FLOPs analytically,
and prints:

- FLOPs by module group (attn1 / attn2 / ff / resnet convs / proj / vae
  / optimizer...), with % of total and speed-of-light ms at peak bf16;
- the top-K single instructions by FLOPs;
- Pallas custom calls (flash attention) with analytic FLOP estimates
  (XLA's cost model can't see inside them);
- totals cross-checked against ``compiled.cost_analysis()``, plus
  ``memory_analysis`` (argument/output/temp bytes).

Usage (same env knobs as bench.py):
    python scripts/step_profile.py                  # SDXL bs=8 default
    BENCH_MODEL=sd15 python scripts/step_profile.py
    TOPK=30 python scripts/step_profile.py
"""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uwudiff_tpu.utils import apply_platform_env

apply_platform_env()  # UWU_PLATFORM=cpu forces the backend pre-init

_SHAPE_RE = re.compile(r"(?:bf16|f16|f32|f64|s32|u32|s8|u8|pred)\[([\d,]*)\]")
_DTYPE_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "f64": 8, "s32": 4,
                "u32": 4, "s8": 1, "u8": 1, "pred": 1}
_TYPED_SHAPE_RE = re.compile(r"(bf16|f16|f32|f64|s32|u32|s8|u8|pred)\[([\d,]*)\]")


def _shape_bytes(typed: str) -> int:
    """Total bytes of every typed shape in a string (tuples sum)."""
    total = 0
    for dt, dims in _TYPED_SHAPE_RE.findall(typed):
        total += _DTYPE_BYTES[dt] * _shape_elems(dims)
    return total


def _shape_elems(shape_str: str) -> int:
    if not shape_str:
        return 1
    n = 1
    for d in shape_str.split(","):
        n *= int(d)
    return n


_DEF_RE = re.compile(
    r"(?:ROOT )?%([\w.\-]+) = \(?((?:bf16|f16|f32|f64|s32|u32|s8|u8|pred)"
    r"\[[\d,]*\])"
)


def _build_shape_table(txt: str) -> dict[str, list[int]]:
    """%instruction-name -> shape, from every definition line (operand
    references in optimized HLO are bare %names without shapes)."""
    table: dict[str, list[int]] = {}
    for line in txt.splitlines():
        m = _DEF_RE.match(line.strip())
        if m:
            dims = _SHAPE_RE.match(m.group(2)).group(1)
            table[m.group(1)] = (
                [int(d) for d in dims.split(",")] if dims else []
            )
    return table


def _operand_shapes(line: str, op: str, table: dict) -> list[list[int]]:
    """Shapes of the operands inside ``op(...)`` on an HLO line, resolved
    through the definition table."""
    m = re.search(re.escape(op) + r"\((.*?)\)", line)
    if not m:
        return []
    names = re.findall(r"%([\w.\-]+)", m.group(1))
    return [table.get(n, []) for n in names]


def _conv_flops(line: str, out_elems: int, table: dict) -> int | None:
    """2 * out_elems * kh * kw * cin / feature_groups."""
    win = re.search(r"window=\{size=(\d+)x(\d+)", line)
    if win is None:  # 1x1 convs may omit the window clause
        kh = kw = 1
    else:
        kh, kw = int(win.group(1)), int(win.group(2))
    # base dilation inserts zeros between lhs elements: only
    # ceil(k/d) taps hit data. XLA encodes batched dot_generals (e.g.
    # attention einsums) as base-dilated convs with size==lhs_dilate —
    # without this correction their FLOPs overcount by that factor.
    dil = re.search(r"lhs_dilate=(\d+)x(\d+)", line)
    if dil:
        dh, dw = int(dil.group(1)), int(dil.group(2))
        kh = -(-kh // dh)
        kw = -(-kw // dw)
    ops = _operand_shapes(line, "convolution", table)
    labels = re.search(r"dim_labels=(\w+)_(\w+)->", line)
    if len(ops) < 2 or not ops[1] or labels is None:
        return None
    rhs_labels = labels.group(2)  # e.g. 01io
    if "i" not in rhs_labels:
        return None
    cin = ops[1][rhs_labels.index("i")]
    # rhs 'i' dim is already per-group for grouped convs
    return 2 * out_elems * kh * kw * cin


def _dot_flops(line: str, out_elems: int, table: dict) -> int | None:
    """2 * out_elems * (product of lhs contracting dims)."""
    ops = _operand_shapes(line, "dot", table)
    m = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", line)
    if len(ops) < 1 or not ops[0] or m is None:
        return None
    contract = 1
    for d in m.group(1).split(","):
        if d:
            contract *= ops[0][int(d)]
    return 2 * out_elems * contract


_GROUPS = [
    ("flash-attention (pallas)",
     r"flash|custom-call|dot_product_attention/pallas"),
    ("attention QK/PV (xla einsum)", r"dot_product_attention"),
    ("self-attn qkv/out proj", r"attn1/"),
    ("cross-attn proj", r"attn2/"),
    ("transformer ff", r"/ff/"),
    ("transformer proj_in/out", r"proj_in|proj_out"),
    ("resnet convs", r"_res_|mid_res|conv_shortcut"),
    ("up/downsample convs", r"upsample|downsample"),
    ("conv_in/out", r"conv_in|conv_out"),
    ("time/cond embeddings", r"time_embedding|add_embedding"),
    ("optimizer/update", r"adamw|adafactor|stochastic|update|opt_state"),
    ("loss/schedule", r"loss|sigma|noise"),
]


def _group_for(op_name: str) -> str:
    for label, pat in _GROUPS:
        if re.search(pat, op_name):
            return label
    return "other"


_INSTR_RE = re.compile(
    # result type may be a tuple "(bf16[...], f32[...])" with spaces
    r"(?:ROOT )?%[\w.\-]+ = (\([^)]*\)|\S+)\s+(convolution|dot|custom-call)\("
)


def _flash_call_flops(line: str, op_name: str, table=None) -> float | None:
    """Analytic MXU FLOPs of a flash-attention Pallas custom call (the
    XLA cost model can't see inside custom calls, so without this the
    reported matmul-MFU silently undercounts every flash program).

    Kernel roles are identified by result arity/dtypes
    (ops/flash_attention.py): fwd -> (out bf16[bh,sq,d], lse
    f32[bh,1,sq]) = 2 matmuls; dq -> bf16[bh,sq,d] (+optional dbias) =
    3 matmuls; dkv -> (dk, dv) = 4 matmuls (s/dp recompute + two grad
    dots). FLOPs per matmul = 2*bh*sq*sk*d. Estimate, labeled "flash"
    in per_instr."""
    if "dot_product_attention" not in op_name or "pallas" not in op_name:
        return None
    # operand segment inside custom-call(...): typed shapes when the
    # dump inlines them, bare %name references (resolved through the
    # definition table) otherwise — optimized-HLO dumps use the latter
    call = line.split("custom-call(", 1)
    if len(call) != 2:
        return None
    result_part, operand_part = call[0], call[1].split(")", 1)[0]
    opnds = [
        [int(x) for x in d.split(",")]
        for _, d in _TYPED_SHAPE_RE.findall(operand_part)
        if d
    ]
    if not opnds and table is not None:
        opnds = [
            table[name]
            for name in re.findall(r"%([\w.\-]+)", operand_part)
            if name in table
        ]
    three_d = [s for s in opnds if len(s) == 3]
    if len(three_d) < 3:
        return None
    bh, sq, d = three_d[0]
    sk = three_d[1][1]
    res_shapes = _TYPED_SHAPE_RE.findall(result_part)
    n_out_3d = sum(1 for _, s in res_shapes if s.count(",") == 2)
    # lse rides only the FORWARD result tuple: (out, f32 lse)
    has_lse = len(res_shapes) >= 2 and any(
        dt == "f32" and s.count(",") == 2 for dt, s in res_shapes
    )
    if has_lse:
        n_matmuls = 2  # forward (out + lse)
    elif n_out_3d >= 2:
        n_matmuls = 4  # dk/dv kernel
    else:
        n_matmuls = 3  # dq kernel
    return float(n_matmuls) * 2.0 * bh * sq * sk * d


def matmul_flops_from_hlo(txt: str) -> tuple[list, dict]:
    """Walk an optimized-HLO text's convolution/dot instructions and
    return ``(per_instr, custom_calls)`` where ``per_instr`` is
    ``[(flops, kind, op_name, line_head), ...]`` and ``custom_calls``
    maps ``(target, op_name) -> count``. Shared by this profile and
    bench.py's ``mfu_matmul`` so the two never diverge."""
    table = _build_shape_table(txt)
    per_instr = []
    custom_calls = defaultdict(int)
    for raw in txt.splitlines():
        line = raw.strip()
        m = _INSTR_RE.match(line)
        if not m:
            continue
        out_shape = _SHAPE_RE.match(m.group(1))
        out_elems = _shape_elems(out_shape.group(1)) if out_shape else 1
        kind = m.group(2)
        name = re.search(r'op_name="([^"]*)"', line)
        op_name = name.group(1) if name else "?"
        if kind == "custom-call":
            tgt = re.search(r'custom_call_target="([^"]*)"', line)
            custom_calls[(tgt.group(1) if tgt else "?", op_name)] += 1
            flops = _flash_call_flops(line, op_name, table)
            if flops:
                per_instr.append((flops, "flash", op_name, line[:120]))
            continue
        flops = (
            _conv_flops(line, out_elems, table)
            if kind == "convolution"
            else _dot_flops(line, out_elems, table)
        )
        if flops is None:
            continue
        per_instr.append((flops, kind, op_name, line[:120]))
    return per_instr, custom_calls


def main():
    topk = int(os.environ.get("TOPK", "15"))
    import bench

    compiled = None
    hlo_file = os.environ.get("HLO_FILE")
    if hlo_file:  # offline re-analysis of a DUMP_HLO file
        # stay off the TPU: the only jax use downstream is the
        # device_kind peak lookup (falls back to the v5e number on cpu)
        import jax

        jax.config.update("jax_platforms", "cpu")
        txt = open(hlo_file).read()
    else:
        bench._enable_compile_cache()
        import jax

        trainer, batch = bench.build_trainer_and_batch()
        trainer.setup(batch)  # params on host, jitted step, sharding
        dev_batch = trainer._put_batch(batch)
        print("# lowering + compiling (warm if bench ran this config)...",
              file=sys.stderr)
        compiled = trainer._train_step.lower(
            trainer.state, trainer.frozen, dev_batch, jax.random.PRNGKey(0)
        ).compile()
        txt = compiled.as_text()
    dump = os.environ.get("DUMP_HLO")
    if dump:
        with open(dump, "w") as f:
            f.write(txt)
        print(f"# HLO text -> {dump}", file=sys.stderr)

    # bytes accounting: HBM traffic estimate per ENTRY-computation
    # instruction (operand + output bytes; fusion bodies are internal
    # VMEM traffic and excluded by only walking ENTRY). bitcast/
    # parameter/tuple plumbing is free.
    bytes_table: dict[str, int] = {}
    vmem_out: set[str] = set()  # outputs placed in memory space 1 (VMEM)
    for line in txt.splitlines():
        m = _DEF_RE.match(line.strip())
        if m:
            typed = line.split(" = ", 1)[1].split("%", 1)[0]
            bytes_table[m.group(1)] = _shape_bytes(
                line.split(" = ", 1)[1].split("(", 1)[0]
            )
            if "S(1)" in typed:
                vmem_out.add(m.group(1))
    _FREE_OPS = {
        "parameter", "constant", "tuple", "get-tuple-element", "bitcast",
        "after-all", "partition-id", "replica-id", "iota",
    }
    bytes_groups = defaultdict(int)
    kind_bytes = defaultdict(int)
    top_bytes = []
    in_entry = False
    entry_bytes = 0
    prefetch_bytes = 0
    prefetch_n = 0
    for raw in txt.splitlines():
        line = raw.strip()
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line == "}":
            in_entry = False
        if not in_entry:
            continue
        m = re.match(
            r"(?:ROOT )?%([\w.\-]+) = \S+ ([\w\-]+)\((.*?)\)", line
        )
        if not m or m.group(2) in _FREE_OPS:
            continue
        name, kind_op, operands = m.groups()
        # HBM traffic = writes to default-space outputs + reads of
        # default-space operands. Buffers XLA's memory-space-assignment
        # placed in VMEM (layout space S(1): prefetched weights via
        # copy/slice-start/done + ConcatBitcast, and short-lived fusion
        # outputs) never touch HBM — counting them as if every operand/
        # output were HBM overstated the SDXL step 186 GB vs 29 GB true
        # HBM traffic (157 GB rides VMEM), inverting the roofline story:
        # the step is MXU-efficiency-bound, not bandwidth-bound.
        b = 0
        if name in vmem_out:
            prefetch_bytes += bytes_table.get(name, 0)
            prefetch_n += 1
        else:
            b = bytes_table.get(name, 0)
        for opn in re.findall(r"%([\w.\-]+)", operands):
            if opn in vmem_out:
                prefetch_bytes += bytes_table.get(opn, 0)
            else:
                b += bytes_table.get(opn, 0)
        nm = re.search(r'op_name="([^"]*)"', line)
        op_name = nm.group(1) if nm else "?"
        bytes_groups[_group_for(op_name)] += b
        kind_bytes[kind_op] += b
        entry_bytes += b
        top_bytes.append((b, kind_op, op_name))

    per_instr, custom_calls = matmul_flops_from_hlo(txt)

    total = sum(f for f, *_ in per_instr)
    peak = bench._device_peak_flops_bf16() or 197e12
    groups = defaultdict(lambda: [0, 0])
    for f, kind, op_name, _ in per_instr:
        g = _group_for(op_name)
        groups[g][0] += f
        groups[g][1] += 1

    print(f"\n== FLOPs by module group (analytic, from optimized HLO) ==")
    print(f"{'group':36s} {'TFLOPs':>9s} {'%':>6s} {'#instr':>7s} {'SoL ms':>8s}")
    for g, (f, n) in sorted(groups.items(), key=lambda kv: -kv[1][0]):
        print(
            f"{g:36s} {f/1e12:9.3f} {100*f/max(total,1):6.1f} {n:7d} "
            f"{f/peak*1000:8.2f}"
        )
    print(f"{'TOTAL (conv+dot)':36s} {total/1e12:9.3f} {'100.0':>6s} "
          f"{len(per_instr):7d} {total/peak*1000:8.2f}")

    bw_peak = 819e9  # v5e HBM GB/s (spec sheet); denominator only
    print(f"\n== HBM bytes by module group (operand+output, ENTRY ops) ==")
    print(f"{'group':36s} {'GB':>9s} {'%':>6s} {'SoL ms @819GB/s':>16s}")
    for g, b in sorted(bytes_groups.items(), key=lambda kv: -kv[1]):
        print(f"{g:36s} {b/1e9:9.2f} {100*b/max(entry_bytes,1):6.1f} "
              f"{b/bw_peak*1000:16.2f}")
    print(f"{'TOTAL':36s} {entry_bytes/1e9:9.2f} {'100.0':>6s} "
          f"{entry_bytes/bw_peak*1000:16.2f}")
    if prefetch_n:
        print(
            f"(VMEM-resident traffic not counted: {prefetch_bytes/1e9:.2f} "
            "GB of operand/output bytes in memory space S(1) — buffers "
            "XLA's memory-space-assignment keeps in VMEM: prefetched "
            "weights and short-lived intermediates)"
        )

    print(f"\n== HBM bytes by op kind ==")
    for k, b in sorted(kind_bytes.items(), key=lambda kv: -kv[1])[:12]:
        print(f"{k:24s} {b/1e9:9.2f} GB {100*b/max(entry_bytes,1):5.1f}%")

    print(f"\n== top {topk} instructions by bytes ==")
    for b, kind_op, op_name in sorted(top_bytes, key=lambda t: -t[0])[:topk]:
        print(f"{b/1e9:8.3f} GB  {kind_op:14s} {op_name[-85:]}")

    print(f"\n== top {topk} instructions by FLOPs ==")
    for f, kind, op_name, head in sorted(per_instr, key=lambda t: -t[0])[:topk]:
        print(f"{f/1e12:8.3f} TF  {kind:12s} {op_name[-90:]}")

    if custom_calls:
        print("\n== custom calls (Pallas kernels; FLOPs not in XLA's model) ==")
        for (tgt, op_name), n in sorted(custom_calls.items()):
            print(f"{n:4d}x  {tgt:24s} {op_name[-80:]}")

    if compiled is None:
        return
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    print("\n== XLA cost_analysis cross-check ==")
    xf = float(ca.get("flops", float("nan")))
    print(f"xla flops:      {xf/1e12:9.3f} TF  (analytic conv+dot: "
          f"{total/1e12:.3f} TF; gap = elementwise + pallas + fusions)")
    for key in ("bytes accessed", "transcendentals"):
        if key in ca:
            print(f"{key:15s} {float(ca[key])/1e9:9.3f} G")
    try:
        mem = compiled.memory_analysis()
        print(f"\n== memory_analysis ==\n{mem}")
    except Exception as e:
        print(f"memory_analysis unavailable: {e}")


if __name__ == "__main__":
    main()
