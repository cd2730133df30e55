"""Flagship SDK gadget flows as end-to-end guest circuits.

Three generated WAT guests (tests/gen_guests.py) mirror the host-call
sequences of the reference SDK's headline gadgets — vbn254fr-batched
Poseidon2, vbn254fr bit_decompose+recompose, and the ECDSA/MSM-trick
scalar-decompose bound — and are proven+verified end-to-end.  Together
they exercise every batch hook (init / bit / equal / quadratic) plus the
ecc and bigint host surfaces under consumer-style call patterns.
"""

import os
import subprocess
import sys

import pytest

from ligero_prover_tpu.vm.run import make_wat_program
from ligero_prover_tpu.zkp.context import NullContext

HERE = os.path.dirname(os.path.abspath(__file__))
GUESTS = os.path.join(HERE, "guests")
ALL = ["poseidon2.wat", "bit_decompose.wat", "ecdsa_p256.wat"]


def _guest(name):
    path = os.path.join(GUESTS, name)
    if not os.path.exists(path):
        subprocess.run([sys.executable, os.path.join(HERE, "gen_guests.py")],
                       check=True)
    return path


@pytest.mark.parametrize("wat", ALL)
def test_witness_pipeline(wat):
    prog = make_wat_program(_guest(wat), [], set(), strict=True)
    ctx = NullContext(k=256)
    prog(ctx)
    assert ctx.rows > 0


def test_guests_are_current():
    """The committed guests must match the generator's output."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "gen_guests", os.path.join(HERE, "gen_guests.py"))
    gg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gg)
    rc = gg._load_rc()
    want = {
        "poseidon2.wat": gg.PoseidonGen(rc).emit(),
        "bit_decompose.wat": gg.gen_bit_decompose(),
        "ecdsa_p256.wat": gg.gen_ecdsa(),
    }
    for name, src in want.items():
        with open(os.path.join(GUESTS, name)) as f:
            assert f.read() == src, f"{name} is stale; rerun gen_guests.py"


@pytest.mark.parametrize("wat", [
    "ecdsa_p256.wat",
    pytest.param("poseidon2.wat", marks=pytest.mark.slow),
    pytest.param("bit_decompose.wat", marks=pytest.mark.slow),
])
def test_prove_verify(wat, shared_executor):
    from ligero_prover_tpu.params import RowGeometry
    from ligero_prover_tpu.prover import prove
    from ligero_prover_tpu.verifier import verify

    geo = RowGeometry(256)
    ex = shared_executor(geo.k, geo.n, batch_rows=8)
    prog = make_wat_program(_guest(wat), [], set())
    res = prove(prog, geometry=geo, executor=ex, encoding_seed=bytes(32))
    assert res.ok, f"{wat}: prover self-check failed {res}"
    v = verify(prog, res.proof, geometry=geo, executor=ex)
    assert v.ok, f"{wat}: verification failed {v}"


@pytest.mark.slow
def test_negative_tamper(shared_executor):
    """A lying assert_equal must fail the prover's linear/quadratic
    self-check (constraint claims are only falsifiable at prove time —
    `witness.py constrain_equal`)."""
    from ligero_prover_tpu.params import RowGeometry
    from ligero_prover_tpu.prover import prove

    with open(_guest("poseidon2.wat")) as f:
        src = f.read()
    bad = src.replace("(i32.const 12345)", "(i32.const 12346)", 1)
    assert bad != src
    geo = RowGeometry(256)
    ex = shared_executor(geo.k, geo.n, batch_rows=8)
    prog = make_wat_program(bad, [], set())
    res = prove(prog, geometry=geo, executor=ex, encoding_seed=bytes(32))
    assert not res.ok
