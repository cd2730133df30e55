"""WASM float edge-case semantics (beyond the reference's f32/f64.wat).

The reference relies on C++ std:: float behavior (interpreter_impl.hpp:
1314-1851); these tests pin the spec-required edges Python gets wrong by
default: signed-zero min/max, NaN-propagating div-by-zero, ceil/floor/
trunc of NaN/inf, and canonical-NaN results from arithmetic.

Each guest compares result *bit patterns* via reinterpret and hits
`unreachable` on mismatch, so a semantics regression surfaces as a trap.
"""

import pytest

from ligero_prover_tpu.vm.run import make_wat_program
from ligero_prover_tpu.vm.values import WasmTrap
from ligero_prover_tpu.zkp.context import NullContext


def run_wat(body32: str) -> None:
    src = f"""
    (module
      (func (export "_start")
        {body32}
      ))
    """
    prog = make_wat_program(src, [], set(), strict=True)
    prog(NullContext(k=256))


def check32(expr: str, bits: int) -> str:
    return f"""
      (if (i32.ne (i32.reinterpret_f32 {expr}) (i32.const {bits}))
          (then unreachable))
    """


def check64(expr: str, bits: int) -> str:
    return f"""
      (if (i64.ne (i64.reinterpret_f64 {expr}) (i64.const {bits}))
          (then unreachable))
    """


NEG0_32 = 0x80000000
QNAN_32 = 0x7FC00000
INF_32 = 0x7F800000
NEG0_64 = 0x8000000000000000
QNAN_64 = 0x7FF8000000000000
INF_64 = 0x7FF0000000000000


def test_min_signed_zero():
    # min(+0, -0) = -0 and min(-0, +0) = -0 in both orders (spec fmin).
    run_wat(
        check32("(f32.min (f32.const 0.0) (f32.const -0.0))", NEG0_32) +
        check32("(f32.min (f32.const -0.0) (f32.const 0.0))", NEG0_32) +
        check64("(f64.min (f64.const 0.0) (f64.const -0.0))", NEG0_64) +
        check64("(f64.min (f64.const -0.0) (f64.const 0.0))", NEG0_64))


def test_max_signed_zero():
    run_wat(
        check32("(f32.max (f32.const 0.0) (f32.const -0.0))", 0) +
        check32("(f32.max (f32.const -0.0) (f32.const 0.0))", 0) +
        check32("(f32.max (f32.const -0.0) (f32.const -0.0))", NEG0_32) +
        check64("(f64.max (f64.const 0.0) (f64.const -0.0))", 0) +
        check64("(f64.max (f64.const -0.0) (f64.const 0.0))", 0))


def test_min_max_nan():
    run_wat(
        check32("(f32.min (f32.const nan) (f32.const 1.0))", QNAN_32) +
        check32("(f32.max (f32.const 1.0) (f32.const nan))", QNAN_32) +
        check64("(f64.min (f64.const nan) (f64.const inf))", QNAN_64))


def test_div_by_zero():
    run_wat(
        check32("(f32.div (f32.const 1.0) (f32.const 0.0))", INF_32) +
        check32("(f32.div (f32.const -1.0) (f32.const 0.0))",
                INF_32 | NEG0_32) +
        check32("(f32.div (f32.const 1.0) (f32.const -0.0))",
                INF_32 | NEG0_32) +
        check32("(f32.div (f32.const 0.0) (f32.const 0.0))", QNAN_32) +
        check32("(f32.div (f32.const -0.0) (f32.const 0.0))", QNAN_32) +
        check32("(f32.div (f32.const nan) (f32.const 0.0))", QNAN_32) +
        check64("(f64.div (f64.const -1.0) (f64.const -0.0))", INF_64))


def test_ceil_floor_trunc_edges():
    # NaN/inf inputs must flow through (Python's math.ceil would raise),
    # and results rounding to zero keep the input's sign.
    run_wat(
        check32("(f32.ceil (f32.const nan))", QNAN_32) +
        check32("(f32.floor (f32.const inf))", INF_32) +
        check32("(f32.trunc (f32.const -inf))", INF_32 | NEG0_32) +
        check32("(f32.ceil (f32.const -0.5))", NEG0_32) +
        check32("(f32.trunc (f32.const -0.5))", NEG0_32) +
        check32("(f32.floor (f32.const 0.5))", 0) +
        check64("(f64.ceil (f64.const -0.25))", NEG0_64) +
        check64("(f64.nearest (f64.const -0.5))", NEG0_64) +
        check64("(f64.nearest (f64.const 2.5))", 0x4000000000000000))


def test_arithmetic_nan_is_canonical():
    # inf - inf, 0 * inf, sqrt(-1) -> canonical quiet NaN bit pattern.
    run_wat(
        check32("(f32.sub (f32.const inf) (f32.const inf))", QNAN_32) +
        check32("(f32.mul (f32.const 0.0) (f32.const inf))", QNAN_32) +
        check32("(f32.sqrt (f32.const -1.0))", QNAN_32) +
        check64("(f64.add (f64.const inf) (f64.const -inf))", QNAN_64))


def test_add_signed_zero():
    # (-0) + (-0) = -0 ; (-0) + (+0) = +0 ; x + (-x) = +0 (round-nearest)
    run_wat(
        check32("(f32.add (f32.const -0.0) (f32.const -0.0))", NEG0_32) +
        check32("(f32.add (f32.const -0.0) (f32.const 0.0))", 0) +
        check32("(f32.add (f32.const 1.5) (f32.const -1.5))", 0) +
        check32("(f32.sqrt (f32.const -0.0))", NEG0_32))


def test_trap_machinery_works():
    # Sanity: a deliberate mismatch must trap, proving the checks bite.
    with pytest.raises(WasmTrap):
        run_wat(check32("(f32.const 1.0)", 0))
