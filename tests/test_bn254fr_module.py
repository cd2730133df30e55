"""bn254fr host module through the full witness pipeline."""

import pytest

from ligero_prover_tpu.vm.run import make_wat_program
from ligero_prover_tpu.zkp.context import NullContext

# Computes z = x * y with handles, constrains it, checks equality with an
# expected constant, and exercises bit decomposition.
WAT = r"""
(module
  (import "bn254fr" "bn254fr_alloc" (func $alloc (param i32)))
  (import "bn254fr" "bn254fr_free" (func $free (param i32)))
  (import "bn254fr" "bn254fr_set_u32" (func $set_u32 (param i32 i32)))
  (import "bn254fr" "bn254fr_mulmod" (func $mulmod (param i32 i32 i32)))
  (import "bn254fr" "bn254fr_addmod" (func $addmod (param i32 i32 i32)))
  (import "bn254fr" "bn254fr_assert_mul" (func $assert_mul (param i32 i32 i32)))
  (import "bn254fr" "bn254fr_assert_add" (func $assert_add (param i32 i32 i32)))
  (import "bn254fr" "bn254fr_assert_equal_u32" (func $assert_eq_u32 (param i32 i32)))
  (import "bn254fr" "bn254fr_get_u64" (func $get_u64 (param i32) (result i64)))
  (import "env" "assert_is_concrete" (func $assert_concrete (param i64)))
  (memory 1)
  ;; handle slots at 0, 8, 16, 24
  (func $test
    (call $alloc (i32.const 0))
    (call $alloc (i32.const 8))
    (call $alloc (i32.const 16))
    (call $alloc (i32.const 24))
    (call $set_u32 (i32.const 0) (i32.const 6))       ;; x = 6
    (call $set_u32 (i32.const 8) (i32.const 7))       ;; y = 7
    (call $mulmod (i32.const 16) (i32.const 0) (i32.const 8))   ;; z = 42
    (call $assert_mul (i32.const 16) (i32.const 0) (i32.const 8))
    (call $assert_eq_u32 (i32.const 16) (i32.const 42))
    (call $addmod (i32.const 24) (i32.const 0) (i32.const 8))   ;; w = 13
    (call $assert_add (i32.const 24) (i32.const 0) (i32.const 8))
    (call $assert_eq_u32 (i32.const 24) (i32.const 13))
    (drop (call $get_u64 (i32.const 16)))
    (call $free (i32.const 0))
    (call $free (i32.const 8))
    (call $free (i32.const 16))
    (call $free (i32.const 24)))
  (export "_start" (func $test)))
"""

BITS_WAT = r"""
(module
  (import "bn254fr" "bn254fr_alloc" (func $alloc (param i32)))
  (import "bn254fr" "bn254fr_free" (func $free (param i32)))
  (import "bn254fr" "bn254fr_set_u32" (func $set_u32 (param i32 i32)))
  (import "bn254fr" "bn254fr_to_bits_checked"
    (func $to_bits (param i32 i32 i32)))
  (memory 1)
  (func $test
    (local $i i32)
    (call $alloc (i32.const 0))
    (call $set_u32 (i32.const 0) (i32.const 0xb))
    ;; bit handles at 8..8+4*8
    (local.set $i (i32.const 0))
    (block $done (loop $l
      (br_if $done (i32.ge_u (local.get $i) (i32.const 4)))
      (call $alloc (i32.add (i32.const 8) (i32.mul (local.get $i) (i32.const 8))))
      (local.set $i (i32.add (local.get $i) (i32.const 1)))
      (br $l)))
    (call $to_bits (i32.const 8) (i32.const 0) (i32.const 4))
    (local.set $i (i32.const 0))
    (block $done2 (loop $l2
      (br_if $done2 (i32.ge_u (local.get $i) (i32.const 4)))
      (call $free (i32.add (i32.const 8) (i32.mul (local.get $i) (i32.const 8))))
      (local.set $i (i32.add (local.get $i) (i32.const 1)))
      (br $l2)))
    (call $free (i32.const 0)))
  (export "_start" (func $test)))
"""


def test_bn254fr_arith_pipeline():
    prog = make_wat_program(WAT, [b"Ligero\x00"], set(), strict=True)
    ctx = NullContext(k=256)
    prog(ctx)
    assert ctx.rows > 0


def test_bn254fr_bits_pipeline():
    prog = make_wat_program(BITS_WAT, [b"Ligero\x00"], set(), strict=True)
    ctx = NullContext(k=256)
    prog(ctx)


def test_bn254fr_prove_verify(shared_executor):
    from ligero_prover_tpu.params import RowGeometry
    from ligero_prover_tpu.prover import prove
    from ligero_prover_tpu.verifier import verify

    geo = RowGeometry(256)
    ex = shared_executor(geo.k, geo.n, batch_rows=8)
    prog = make_wat_program(WAT, [b"Ligero\x00"], set())
    res = prove(prog, geometry=geo, executor=ex, encoding_seed=bytes(32))
    assert res.ok, f"prover self-check failed {res}"
    v = verify(prog, res.proof, geometry=geo, executor=ex)
    assert v.ok, f"verification failed {v}"
