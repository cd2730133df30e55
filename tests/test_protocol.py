"""End-to-end Ligero protocol on synthetic constraint programs.

Uses a small row geometry (k=64, l=k-SAMPLE? no — SAMPLE_SIZE must stay 192
in the real protocol; for protocol tests we shrink via a custom geometry
with a smaller sample) — instead we keep the real 192-sample protocol but
tiny packing is impossible (l = k - 192 needs k > 192), so the smallest
round geometry is k=256 (l=64, n=1024).
"""

import numpy as np
import pytest

from ligero_prover_tpu.params import RowGeometry
from ligero_prover_tpu.prover import prove
from ligero_prover_tpu.verifier import verify
from ligero_prover_tpu.zkp.executor import TpuExecutor

GEO = RowGeometry(256)   # l=64, n=1024: every row flushes after 64 witnesses
_EXEC = {}


def executor():
    if "x" not in _EXEC:
        _EXEC["x"] = TpuExecutor(GEO.k, GEO.n, batch_rows=8)
    return _EXEC["x"]


def simple_program(ctx):
    """A few linear + quadratic constraints through the backend DSL."""
    b = ctx.backend
    x = b.acquire_witness(7)
    y = b.acquire_witness(35)
    z = b.eval(x * 5)               # z = 35, mul-by-constant
    b.assert_equal(z, y)
    s = b.eval(x + y)               # 42
    b.assert_const(s, 42)
    p = b.eval(x * x)               # full quadratic gate
    b.assert_const(p, 49)
    del x, y, z, s, p


def wide_program(ctx):
    """Enough witnesses to flush several rows (l=64)."""
    b = ctx.backend
    for i in range(150):
        w = b.acquire_witness(i)
        v = b.eval(w + 1)
        b.assert_const(v, i + 1)
        del w, v
    # some quadratic rows
    for i in range(5):
        a = b.acquire_witness(i + 2)
        c = b.eval(a * a)
        b.assert_const(c, (i + 2) ** 2)
        del a, c


def bits_program(ctx):
    b = ctx.backend
    x = b.acquire_witness(0b1011)
    bits = b.bit_decompose(x, 4)
    assert [bits[i].val for i in range(4)] == [1, 1, 0, 1]
    y = b.bit_compose(bits)
    b.assert_equal(x, y)
    gt, eq = b.bitwise_gt(b.bit_decompose(b.acquire_witness(9), 4),
                          b.bit_decompose(b.acquire_witness(5), 4), "unsign")
    b.assert_const(gt, 1)
    del x, bits, y, gt, eq


@pytest.mark.parametrize("program", [simple_program, bits_program])
def test_prove_verify_roundtrip(program):
    res = prove(program, geometry=GEO, executor=executor(),
                encoding_seed=bytes(range(32)))
    assert res.valid_code, "code test failed on prover self-check"
    assert res.valid_linear, "linear test failed on prover self-check"
    assert res.valid_quad, "quadratic test failed on prover self-check"
    v = verify(program, res.proof, geometry=GEO, executor=executor())
    assert v.valid_merkle
    assert v.valid_code and v.valid_linear and v.valid_quad
    assert v.code_equal and v.linear_equal and v.quad_equal
    assert v.ok


def test_proof_bytes_deterministic(monkeypatch):
    """Two prove() runs at a fixed encoding seed + timestamp must produce
    identical bytes (``zkp/proof.py``: gzip mtime=0, injectable timestamp).
    This pins the transcript: any nondeterminism in randomness draw order,
    commit order, or serialization shows up here."""
    monkeypatch.setenv("LIGERO_PROOF_TIMESTAMP", "1700000000")
    a = prove(simple_program, geometry=GEO, executor=executor(),
              encoding_seed=bytes(range(32)))
    b = prove(simple_program, geometry=GEO, executor=executor(),
              encoding_seed=bytes(range(32)))
    assert a.ok and b.ok
    assert a.proof == b.proof


def test_tampered_proof_rejected():
    res = prove(simple_program, geometry=GEO, executor=executor(),
                encoding_seed=bytes(32))
    assert res.ok
    # flip one bit in a sampled column
    import gzip
    from ligero_prover_tpu.proto import ligero_proof_pb2 as pb
    env = pb.LigeroProofEnvelope()
    env.ParseFromString(gzip.decompress(res.proof))
    env.ligero_proof.sampled_data.values[5] ^= 1
    tampered = gzip.compress(env.SerializeToString())
    v = verify(simple_program, tampered, geometry=GEO, executor=executor())
    assert not v.ok


def test_wrong_program_rejected():
    res = prove(simple_program, geometry=GEO, executor=executor(),
                encoding_seed=bytes(32))

    def other_program(ctx):
        b = ctx.backend
        x = b.acquire_witness(8)   # different witness values
        y = b.acquire_witness(40)
        z = b.eval(x * 5)
        b.assert_equal(z, y)
        s = b.eval(x + y)
        b.assert_const(s, 48)
        p = b.eval(x * x)
        b.assert_const(p, 64)
        del x, y, z, s, p

    v = verify(other_program, res.proof, geometry=GEO, executor=executor())
    assert not v.ok
