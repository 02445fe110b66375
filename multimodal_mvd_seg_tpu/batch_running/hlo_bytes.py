"""Per-instruction HBM byte attribution of a compiled train step.

XLA's aggregate cost analysis says the 3d_fullres step moves ~133 GB
where the activation arithmetic needs ~25 GB (documentation/
tpu_performance.md). The aggregate can't say WHERE. This tool compiles
the bench train step for the current backend, walks the optimized HLO's
entry computation, and ranks instructions by

    bytes(instr) = sum(operand shapes) + size(result shape)

which is the HBM traffic a post-fusion instruction costs (every
top-level instruction reads its operands from and writes its result to
HBM; in-fusion temporaries stay in registers/VMEM). `copy`/`transpose`
rows are pure relayout traffic; `fusion` rows carry the op_name metadata
of their hottest source op, mapping straight back to model code.

Run on the bench chip (single free TPU required):
  PYTHONPATH=/root/repo:/root/.axon_site python -m \
      multimodal_mvd_seg_tpu.batch_running.hlo_bytes [--top 40] [--mvd]
"""

import argparse
import re
from collections import defaultdict

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16, "s4": 1, "u4": 1, "f8e4m3fn": 1, "f8e5m2": 1,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(text: str) -> int:
    """Total bytes of every array shape mentioned in an HLO type string
    (handles tuples by summing members)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


_NAME_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*")
# first lowercase identifier followed by '(' after the type: the opcode.
# (TPU layout suffixes like {:T(8,128)(2,1)} use uppercase letters only.)
_OPCODE_RE = re.compile(r"\b([a-z][a-z0-9_-]*)\(")
_METADATA_RE = re.compile(r'op_name="([^"]*)"')


def _split_instruction(line: str):
    """-> (name, type_text, opcode, args_text) or None."""
    mn = _NAME_RE.match(line)
    if not mn:
        return None
    rhs = line[mn.end():]
    mo = _OPCODE_RE.search(rhs)
    if not mo:
        return None
    return (mn.group(1), rhs[:mo.start()].strip(), mo.group(1),
            rhs[mo.end():])


def rank_entry_instructions(hlo_text: str, top: int = 40,
                            computation: str = None):
    """Parse the optimized HLO module text; return (rows, totals).

    rows: (bytes, opcode, name, result_shape, op_name_metadata), entry
    computation only, largest first. Operand shapes are resolved from the
    instruction's own text (HLO text writes each operand as shape %name
    inside the call parens for the entry computation after optimization
    -- when it doesn't, we fall back to the result-shape-only count and
    mark the row approximate).

    ``computation``: rank a named non-entry computation instead (e.g. a
    while body — substring match on the computation header line).
    """
    if computation is not None:
        m = re.search(r"^%?[\w.-]*" + re.escape(computation)
                      + r"[\w.-]* \([^)]*\) -> ", hlo_text, re.M)
        if m is None:
            raise ValueError(
                f"no computation matching {computation!r} in HLO text")
    else:
        # find the entry computation: "ENTRY %name (...) -> ... {" ... "}"
        m = re.search(r"^ENTRY ", hlo_text, re.M)
    if m is None:
        raise ValueError("no ENTRY computation in HLO text")
    body_start = hlo_text.index("{", m.start()) + 1
    depth, i = 1, body_start
    while depth and i < len(hlo_text):
        depth += {"{": 1, "}": -1}.get(hlo_text[i], 0)
        i += 1
    entry = hlo_text[body_start:i - 1]

    # map of instruction name -> result type text (for operand lookup);
    # entry parameters live in the signature, so pull them from there too
    sig = hlo_text[m.start():body_start]
    shapes = {}
    for pname, ptype in re.findall(r"%?([\w.-]+):\s*((?:\([^)]*\)|[^,)]+))",
                                   sig):
        shapes[pname] = ptype
    parsed = []
    for line in entry.splitlines():
        p = _split_instruction(line)
        if p:
            parsed.append(p)
            shapes[p[0]] = p[1]

    rows = []
    total = 0
    by_opcode = defaultdict(int)
    operand_ref = re.compile(r"%([\w.-]+)")
    for name, result_shape, opcode, args in parsed:
        if opcode in ("parameter", "constant", "get-tuple-element",
                      "tuple", "bitcast", "after-all"):
            continue  # no HBM traffic of their own
        out_b = shape_bytes(result_shape)
        # operands: every %ref inside the argument parens (metadata and
        # calls= refs don't resolve to entry instructions, so they add 0)
        meta_at = args.find("metadata=")
        arg_zone = args if meta_at < 0 else args[:meta_at]
        in_b = 0
        for ref in operand_ref.findall(arg_zone):
            if ref in shapes:
                in_b += shape_bytes(shapes[ref])
        meta = _METADATA_RE.search(args)
        b = in_b + out_b
        total += b
        by_opcode[opcode] += b
        rows.append((b, opcode, name, result_shape.strip(),
                     meta.group(1) if meta else ""))
    rows.sort(key=lambda r: -r[0])
    return rows[:top], total, dict(sorted(
        by_opcode.items(), key=lambda kv: -kv[1]))


def _build_bench_step():
    import bench
    return bench.build_step()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--computation", default=None,
                    help="also rank a named non-entry computation "
                         "(e.g. a while body)")
    ap.add_argument("--file", default=None,
                    help="rank a saved HLO text dump offline (no chip "
                         "needed) instead of compiling the bench step")
    args = ap.parse_args()

    if args.file:
        txt = open(args.file).read()
    else:
        import jax
        step, step_args = _build_bench_step()
        lowered = jax.jit(step).lower(*step_args)
        compiled = lowered.compile()
        txt = compiled.as_text()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        print(f"cost_analysis: {ca.get('flops', 0)/1e12:.2f} TFLOP, "
              f"{ca.get('bytes accessed', 0)/1e9:.1f} GB counted")

    for comp in [None] + ([args.computation] if args.computation else []):
        rows, total, by_opcode = rank_entry_instructions(
            txt, args.top, computation=comp)
        where = "entry" if comp is None else f"computation {comp!r}"
        print(f"\nstatic operand+result bytes over {where} instructions: "
              f"{total/1e9:.1f} GB")
        print("\nby opcode:")
        for op, b in list(by_opcode.items())[:12]:
            print(f"  {op:<24s} {b/1e9:8.2f} GB")
        print(f"\ntop {args.top} instructions:")
        for b, opcode, name, shape, meta in rows:
            meta = (meta[:110] + "…") if len(meta) > 110 else meta
            print(f"  {b/1e6:9.1f} MB  {opcode:<16s} {shape[:48]:<48s} "
                  f"{meta}")


if __name__ == "__main__":
    main()
