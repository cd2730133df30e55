"""Sharded prover on the 8-virtual-device CPU mesh.

The protocol-correct sharded prover (parallel/mesh.py) must honor the
Fiat-Shamir ordering and produce BIT-IDENTICAL proof bytes to the
single-device prover at the same encoding seed — the strongest possible
equivalence check (it subsumes root, seeds, openings, serialization).
"""

import os

import numpy as np
import pytest
import jax

from ligero_prover_tpu.params import RowGeometry
from ligero_prover_tpu.prover import prove
from ligero_prover_tpu.verifier import verify
from ligero_prover_tpu.vm.run import make_wat_program
from ligero_prover_tpu.parallel.mesh import make_mesh, ShardedExecutor

GEO = RowGeometry(256)
ARGS = [b"Ligero\x00"]
SEED = bytes(range(32))


@pytest.fixture(scope="module")
def mesh():
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide 8 virtual CPU devices"
    return make_mesh(devices[:8])


def _wat(name):
    return make_wat_program(f"/root/reference/tests/{name}", ARGS, set())


def test_sharded_prove_bit_identical(mesh, shared_executor, monkeypatch):
    monkeypatch.setenv("LIGERO_PROOF_TIMESTAMP", "1700000000")
    prog = _wat("i32_add.wat")
    single = prove(prog, geometry=GEO,
                   executor=shared_executor(GEO.k, GEO.n, batch_rows=8),
                   encoding_seed=SEED)
    assert single.ok
    sharded = prove(prog, geometry=GEO, mesh=mesh, batch_rows=8,
                    encoding_seed=SEED)
    assert sharded.ok
    assert sharded.proof == single.proof


@pytest.mark.slow
def test_sharded_proof_verifies(mesh, shared_executor, monkeypatch):
    monkeypatch.setenv("LIGERO_PROOF_TIMESTAMP", "1700000000")
    prog = _wat("i32_sub.wat")
    res = prove(prog, geometry=GEO, mesh=mesh, batch_rows=8,
                encoding_seed=SEED)
    assert res.ok
    v = verify(prog, res.proof, geometry=GEO,
               executor=shared_executor(GEO.k, GEO.n, batch_rows=8))
    assert v.ok


def test_sharded_state_is_distributed(mesh):
    """The sha state and accumulators really are sharded over the mesh
    (not silently replicated)."""
    ex = ShardedExecutor(GEO.k, GEO.n, mesh, batch_rows=8)
    state, pending, hp = ex.sha_init(GEO.n)
    assert len(state.sharding.device_set) == 8
    rows = np.zeros((8, GEO.k, 8), np.uint32)
    out = ex.commit_step((state, pending, hp), rows, 8)
    assert len(out[0].sharding.device_set) == 8
