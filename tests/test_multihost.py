"""Multi-host (DCN) prover: 2 jax.distributed processes x 4 devices.

Validates the SURVEY §2.7 north-star claim spelled out in
``parallel/mesh.py``: with a mesh spanning hosts, every host derives the
identical Fiat-Shamir transcript from replicated pipeline outputs, and
the distributed prover's proof bytes are bit-identical to the
single-device prover's at the same encoding seed.
"""

import hashlib
import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_prover_bit_identical(shared_executor):
    port = str(_free_port())
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # workers set their own 4-device count
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=1200)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, f"no RESULT line:\n{out}\n{err}"
        outs.append(line[-1].split())

    (_, root0, h0, ok0), (_, root1, h1, ok1) = outs
    assert ok0 == ok1 == "True"
    # replicated transcript: both hosts computed the same root and proof
    assert root0 == root1
    assert h0 == h1

    # bit-identical to the single-device prover at the same seed
    from ligero_prover_tpu.params import RowGeometry
    from ligero_prover_tpu.prover import prove
    from ligero_prover_tpu.vm.run import make_wat_program

    os.environ["LIGERO_PROOF_TIMESTAMP"] = "1700000000"
    geo = RowGeometry(256)
    ex = shared_executor(geo.k, geo.n, batch_rows=8)
    prog = make_wat_program("/root/reference/tests/i32_add.wat",
                            [b"Ligero\x00"], set())
    single = prove(prog, geometry=geo, executor=ex,
                   encoding_seed=bytes(range(32)))
    assert hashlib.sha256(single.proof).hexdigest() == h0
    assert single.root.hex() == root0
