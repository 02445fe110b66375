"""The offline HLO byte-attribution parser (batch_running/hlo_bytes.py)
reads scheduled-HLO text correctly: shape byte math, operand resolution,
opcode classification, metadata extraction."""

from multimodal_mvd_seg_tpu.batch_running.hlo_bytes import (
    rank_entry_instructions, shape_bytes)

_HLO = """\
HloModule jit_f, is_scheduled=true

ENTRY %main.42 (p0: f32[4,128], p1: bf16[2,8,128]) -> f32[4,128] {
  %p0 = f32[4,128]{1,0:T(8,128)} parameter(0)
  %p1 = bf16[2,8,128]{2,1,0:T(8,128)(2,1)} parameter(1)
  %copy.1 = bf16[2,8,128]{1,2,0:T(8,128)(2,1)} copy(%p1), metadata={op_name="jit(f)/relayout"}
  %fusion.1 = f32[4,128]{1,0:T(8,128)} fusion(%p0, %copy.1), kind=kLoop, calls=%fused_add, metadata={op_name="jit(f)/add"}
  ROOT %tuple.9 = (f32[4,128]{1,0:T(8,128)}) tuple(%fusion.1)
}
"""


def test_shape_bytes():
    assert shape_bytes("f32[4,128]") == 4 * 128 * 4
    assert shape_bytes("bf16[2,8,128]") == 2 * 8 * 128 * 2
    # tuples sum members; layout/tiling suffixes are ignored
    assert shape_bytes("(f32[2]{0}, bf16[4]{0:T(128)})") == 8 + 8


def test_rank_entry_instructions():
    rows, total, by_opcode = rank_entry_instructions(_HLO, top=10)
    ops = {r[1] for r in rows}
    assert ops == {"copy", "fusion"}  # parameter/tuple carry no traffic
    copy_row = next(r for r in rows if r[1] == "copy")
    # copy: operand bf16[2,8,128] + result bf16[2,8,128]
    assert copy_row[0] == 2 * (2 * 8 * 128 * 2)
    assert copy_row[4] == "jit(f)/relayout"
    fusion_row = next(r for r in rows if r[1] == "fusion")
    # fusion: p0 (f32) + copy.1 (bf16) + result (f32)
    assert fusion_row[0] == 2 * (4 * 128 * 4) + 2 * 8 * 128 * 2
    assert total == copy_row[0] + fusion_row[0]
    assert by_opcode["copy"] == copy_row[0]


_HLO_WITH_BODY = _HLO + """
%while_body.7 (arg: f32[8,128]) -> f32[8,128] {
  %arg = f32[8,128]{1,0:T(8,128)} parameter(0)
  %mul.3 = f32[8,128]{1,0:T(8,128)} multiply(%arg, %arg), metadata={op_name="jit(f)/mul"}
  ROOT %copy.done = f32[8,128]{1,0:T(8,128)} copy(%mul.3)
}
"""


def test_rank_named_computation():
    """--computation ranks a non-entry computation (e.g. a while body)."""
    rows, total, by_opcode = rank_entry_instructions(
        _HLO_WITH_BODY, top=10, computation="while_body")
    ops = {r[1] for r in rows}
    assert ops == {"multiply", "copy"}
    mul = next(r for r in rows if r[1] == "multiply")
    assert mul[0] == 3 * (8 * 128 * 4)  # two operands + result
    assert mul[4] == "jit(f)/mul"
    # entry ranking unchanged by the extra computation in the module text
    rows_e, _, _ = rank_entry_instructions(_HLO_WITH_BODY, top=10)
    assert {r[1] for r in rows_e} == {"copy", "fusion"}
    import pytest
    with pytest.raises(ValueError, match="no computation"):
        rank_entry_instructions(_HLO_WITH_BODY, computation="nope_xyz")
