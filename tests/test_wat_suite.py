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


@pytest.mark.parametrize("wat", ALL_WATS)
def test_execute_witness_pipeline(wat):
    prog = make_wat_program(os.path.join(REF_TESTS, wat), ARGS, set(),
                            strict=True)
    ctx = NullContext(k=256)
    prog(ctx)
    assert ctx.rows > 0 or wat.startswith("memory")


@pytest.mark.parametrize("wat", ALL_WATS)
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
