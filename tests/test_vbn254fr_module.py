"""vbn254fr batch host module: arena ops + batch hooks through the full
prove/verify pipeline (reference behavior: ``vbn254fr.hpp`` +
``nonbatch_context.hpp`` batch hooks; reference tests: SDK Poseidon2
batch circuits)."""

import numpy as np
import pytest

from ligero_prover_tpu.vm.run import make_wat_program
from ligero_prover_tpu.zkp.context import NullContext

# z = x * y on full rows, checked against a scalar constant row; division
# and copy round-trips.  Handles are u32s at addresses 0,4,8,12,16.
WAT = r"""
(module
  (import "vbn254fr" "vbn254fr_get_size" (func $size (result i64)))
  (import "vbn254fr" "vbn254fr_alloc" (func $alloc (param i32)))
  (import "vbn254fr" "vbn254fr_free" (func $free (param i32)))
  (import "vbn254fr" "vbn254fr_set_ui_scalar" (func $set_scalar (param i32 i32)))
  (import "vbn254fr" "vbn254fr_mulmod" (func $mulmod (param i32 i32 i32)))
  (import "vbn254fr" "vbn254fr_divmod" (func $divmod (param i32 i32 i32)))
  (import "vbn254fr" "vbn254fr_addmod" (func $addmod (param i32 i32 i32)))
  (import "vbn254fr" "vbn254fr_copy" (func $copy (param i32 i32)))
  (import "vbn254fr" "vbn254fr_assert_equal" (func $assert_eq (param i32 i32)))
  (memory 1)
  (func $test
    (drop (call $size))
    (call $alloc (i32.const 0))     ;; a
    (call $alloc (i32.const 4))     ;; b
    (call $alloc (i32.const 8))     ;; c
    (call $alloc (i32.const 12))    ;; d
    (call $alloc (i32.const 16))    ;; e
    (call $set_scalar (i32.const 0) (i32.const 6))
    (call $set_scalar (i32.const 4) (i32.const 7))
    (call $mulmod (i32.const 8) (i32.const 0) (i32.const 4))   ;; c = 42
    (call $set_scalar (i32.const 12) (i32.const 42))
    (call $assert_eq (i32.const 8) (i32.const 12))
    (call $divmod (i32.const 16) (i32.const 8) (i32.const 4))  ;; e = c/b = 6
    (call $assert_eq (i32.const 16) (i32.const 0))
    (call $copy (i32.const 16) (i32.const 0))                  ;; e <- a
    (call $addmod (i32.const 16) (i32.const 16) (i32.const 0)) ;; e = 12
    (call $free (i32.const 0))
    (call $free (i32.const 4))
    (call $free (i32.const 8))
    (call $free (i32.const 12))
    (call $free (i32.const 16)))
  (export "_start" (func $test)))
"""

# Constant-operand family: build the 8x u32 LE constant in memory at 1024.
CONST_WAT = r"""
(module
  (import "vbn254fr" "vbn254fr_alloc" (func $alloc (param i32)))
  (import "vbn254fr" "vbn254fr_free" (func $free (param i32)))
  (import "vbn254fr" "vbn254fr_set_ui_scalar" (func $set_scalar (param i32 i32)))
  (import "vbn254fr" "vbn254fr_addmod_constant" (func $addc (param i32 i32 i32)))
  (import "vbn254fr" "vbn254fr_submod_constant" (func $subc (param i32 i32 i32)))
  (import "vbn254fr" "vbn254fr_mulmod_constant" (func $mulc (param i32 i32 i32)))
  (import "vbn254fr" "vbn254fr_constant_submod" (func $csub (param i32 i32 i32)))
  (import "vbn254fr" "vbn254fr_assert_equal" (func $assert_eq (param i32 i32)))
  (memory 1)
  (func $test
    (call $alloc (i32.const 0))     ;; x
    (call $alloc (i32.const 4))     ;; t
    (call $alloc (i32.const 8))     ;; want
    (call $set_scalar (i32.const 0) (i32.const 10))
    (i32.store (i32.const 1024) (i32.const 5))          ;; const 5
    (call $addc (i32.const 4) (i32.const 0) (i32.const 1024))  ;; t = 15
    (call $mulc (i32.const 4) (i32.const 4) (i32.const 1024))  ;; t = 75
    (call $subc (i32.const 4) (i32.const 4) (i32.const 1024))  ;; t = 70
    (i32.store (i32.const 1056) (i32.const 100))        ;; const 100
    (call $csub (i32.const 4) (i32.const 1056) (i32.const 4))  ;; t = 30
    (call $set_scalar (i32.const 8) (i32.const 30))
    (call $assert_eq (i32.const 4) (i32.const 8))
    (call $free (i32.const 0))
    (call $free (i32.const 4))
    (call $free (i32.const 8)))
  (export "_start" (func $test)))
"""

# set_ui (vector form): first 3 lanes {2,3,4}, squared, checked via a
# second vector {4,9,16}; remaining lanes are zero on both sides.
VEC_WAT = r"""
(module
  (import "vbn254fr" "vbn254fr_alloc" (func $alloc (param i32)))
  (import "vbn254fr" "vbn254fr_free" (func $free (param i32)))
  (import "vbn254fr" "vbn254fr_set_ui" (func $set_ui (param i32 i32 i64)))
  (import "vbn254fr" "vbn254fr_mulmod" (func $mulmod (param i32 i32 i32)))
  (import "vbn254fr" "vbn254fr_assert_equal" (func $assert_eq (param i32 i32)))
  (memory 1)
  (func $test
    (call $alloc (i32.const 0))
    (call $alloc (i32.const 4))
    (call $alloc (i32.const 8))
    (i32.store (i32.const 1024) (i32.const 2))
    (i32.store (i32.const 1028) (i32.const 3))
    (i32.store (i32.const 1032) (i32.const 4))
    (call $set_ui (i32.const 0) (i32.const 1024) (i64.const 3))
    (call $mulmod (i32.const 4) (i32.const 0) (i32.const 0))   ;; squares
    (i32.store (i32.const 1040) (i32.const 4))
    (i32.store (i32.const 1044) (i32.const 9))
    (i32.store (i32.const 1048) (i32.const 16))
    (call $set_ui (i32.const 8) (i32.const 1040) (i64.const 3))
    (call $assert_eq (i32.const 4) (i32.const 8))
    (call $free (i32.const 0))
    (call $free (i32.const 4))
    (call $free (i32.const 8)))
  (export "_start" (func $test)))
"""

# bit_decompose: 254 bit rows of the scalar row 0xb, recomposition not
# constrained (matches vbn254fr.hpp:551-568).
BITS_WAT = r"""
(module
  (import "vbn254fr" "vbn254fr_alloc" (func $alloc (param i32)))
  (import "vbn254fr" "vbn254fr_free" (func $free (param i32)))
  (import "vbn254fr" "vbn254fr_set_ui_scalar" (func $set_scalar (param i32 i32)))
  (import "vbn254fr" "vbn254fr_bit_decompose" (func $bits (param i32 i32)))
  (memory 1)
  (func $test
    (local $i i32)
    (call $alloc (i32.const 0))
    (call $set_scalar (i32.const 0) (i32.const 0xb))
    ;; 254 bit handles at 1024..1024+254*4
    (local.set $i (i32.const 0))
    (block $done (loop $l
      (br_if $done (i32.ge_u (local.get $i) (i32.const 254)))
      (call $alloc (i32.add (i32.const 1024) (i32.mul (local.get $i) (i32.const 4))))
      (local.set $i (i32.add (local.get $i) (i32.const 1)))
      (br $l)))
    (call $bits (i32.const 1024) (i32.const 0))
    (local.set $i (i32.const 0))
    (block $done2 (loop $l2
      (br_if $done2 (i32.ge_u (local.get $i) (i32.const 254)))
      (call $free (i32.add (i32.const 1024) (i32.mul (local.get $i) (i32.const 4))))
      (local.set $i (i32.add (local.get $i) (i32.const 1)))
      (br $l2)))
    (call $free (i32.const 0)))
  (export "_start" (func $test)))
"""


def _roundtrip(wat, shared_executor):
    from ligero_prover_tpu.params import RowGeometry
    from ligero_prover_tpu.prover import prove
    from ligero_prover_tpu.verifier import verify

    geo = RowGeometry(256)
    ex = shared_executor(geo.k, geo.n, batch_rows=8)
    prog = make_wat_program(wat, [b"Ligero\x00"], set())
    res = prove(prog, geometry=geo, executor=ex, encoding_seed=bytes(32))
    assert res.ok, f"prover self-check failed {res}"
    v = verify(prog, res.proof, geometry=geo, executor=ex)
    assert v.ok, f"verification failed {v}"
    return res


def test_vbn254fr_null_pipeline():
    prog = make_wat_program(WAT, [b"Ligero\x00"], set(), strict=True)
    ctx = NullContext(k=256)
    prog(ctx)
    assert ctx.rows > 0


def test_vbn254fr_prove_verify(shared_executor):
    res = _roundtrip(WAT, shared_executor)
    # rows: set a, set b, (c=a*b: 3), set d, equal(c,d): 2, div: 3,
    # copy: 2, set want... plus 3 masks & witness mask rows
    assert res.num_rows >= 13


@pytest.mark.slow
def test_vbn254fr_constants_prove_verify(shared_executor):
    _roundtrip(CONST_WAT, shared_executor)


@pytest.mark.slow
def test_vbn254fr_vector_prove_verify(shared_executor):
    _roundtrip(VEC_WAT, shared_executor)


@pytest.mark.slow
def test_vbn254fr_bits_prove_verify(shared_executor):
    _roundtrip(BITS_WAT, shared_executor)


def test_vbn254fr_bits_null():
    prog = make_wat_program(BITS_WAT, [b"Ligero\x00"], set(), strict=True)
    ctx = NullContext(k=256)
    prog(ctx)
    assert ctx.rows == 258  # 1 init + 254 bit rows + 3 mask rows


@pytest.mark.slow
def test_vbn254fr_tamper_detected(shared_executor):
    """A lying mulmod (patched arena) must break verification."""
    from ligero_prover_tpu.params import RowGeometry
    from ligero_prover_tpu.prover import prove
    from ligero_prover_tpu.verifier import verify
    from ligero_prover_tpu.vm.hostmods import vbn254fr as vmod

    geo = RowGeometry(256)
    ex = shared_executor(geo.k, geo.n, batch_rows=8)
    prog = make_wat_program(WAT, [b"Ligero\x00"], set())

    orig = vmod.VBn254frModule.vbn254fr_mulmod

    def lying_mulmod(self):
        xi, yi, oi = self._pop3_slots()
        self.arena, rx, ry, out = self.ops["mul"](self.arena, xi, yi, oi)
        nx, ny, nz = self._rows_np(rx, ry, out)
        if nz is not None:
            nz = np.asarray(nz, np.uint32).copy()  # rows are device-resident
            nz[0] ^= 1  # claim a wrong product in lane 0
        self.zk.on_batch_quadratic(nx, ny, nz)

    vmod.VBn254frModule.vbn254fr_mulmod = lying_mulmod
    try:
        res = prove(prog, geometry=geo, executor=ex,
                    encoding_seed=bytes(32))
        assert not res.valid_quad
    finally:
        vmod.VBn254frModule.vbn254fr_mulmod = orig
