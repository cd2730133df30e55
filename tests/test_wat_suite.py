"""Conformance against the reference's .wat opcode suite.

The reference runs its FULL prover on every `.wat` test and checks the
exit code (``tests/CMakeLists.txt:22-38``).  This suite does the same:
every program is executed through the complete witness pipeline and then
proven AND verified end-to-end at k=256 (the smallest legal geometry:
l = k - 192 > 0), sharing one executor so the jitted pipelines compile
once per session (and persist in the compilation cache across sessions).

A fast NullContext pass runs first as a pipeline smoke check — it
exercises the dual-semantics interpreter + witness manager without any
device work and gives much better diagnostics when an opcode regresses.
"""

import os
import glob

import pytest

from ligero_prover_tpu.vm.run import make_wat_program
from ligero_prover_tpu.zkp.context import NullContext

REF_TESTS = "/root/reference/tests"
ALL_WATS = sorted(os.path.basename(p)
                  for p in glob.glob(os.path.join(REF_TESTS, "*.wat")))

ARGS = [b"Ligero\x00"]

# Fast-tier representatives: one per opcode family (add/sub carry paths,
# mul decompose, div oracle, bitwise, shifts, bit scans, compares, floats,
# secret-tag memory ops).  Everything else proves end-to-end in the slow
# (nightly) tier only.
FAST_WATS = {
    "i32_add.wat",    # linear/carry witness path
    "i32_div_s.wat",  # div oracle + bit decompose + range checks
}

PROVE_PARAMS = [
    (w if w in FAST_WATS else pytest.param(w, marks=pytest.mark.slow))
    for w in ALL_WATS
]


@pytest.mark.parametrize("wat", ALL_WATS)
def test_execute_witness_pipeline(wat):
    prog = make_wat_program(os.path.join(REF_TESTS, wat), ARGS, set(),
                            strict=True)
    ctx = NullContext(k=256)
    prog(ctx)
    assert ctx.rows > 0 or wat.startswith("memory")


@pytest.mark.parametrize("wat", PROVE_PARAMS)
def test_prove_verify(wat, shared_executor):
    from ligero_prover_tpu.params import RowGeometry
    from ligero_prover_tpu.prover import prove
    from ligero_prover_tpu.verifier import verify

    geo = RowGeometry(256)
    ex = shared_executor(geo.k, geo.n, batch_rows=8)
    prog = make_wat_program(os.path.join(REF_TESTS, wat), ARGS, set())
    res = prove(prog, geometry=geo, executor=ex, encoding_seed=bytes(32))
    assert res.ok, f"{wat}: prover self-check failed {res}"
    v = verify(prog, res.proof, geometry=geo, executor=ex)
    assert v.ok, f"{wat}: verification failed {v}"
