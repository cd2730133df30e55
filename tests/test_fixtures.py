"""Golden transcript fixtures: pin seeds, sample indices, and proof bytes.

Guards the full transcript chain (encoding randomness consumption, commit
order, masks, Fiat-Shamir seeds, Fisher-Yates sampling, protobuf+gzip
framing) against silent regression — the TPU analogue of cross-checking
against the reference prover at an injected encoding seed
(``webgpu_prover.cpp:242-245``; SURVEY §4 parity strategy).

Regenerate intentionally with `python tests/gen_fixtures.py`.
"""

import hashlib
import json
import os

import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "transcripts.json")

with open(FIX) as f:
    FIXTURES = json.load(f)


@pytest.mark.parametrize("wat", sorted(FIXTURES["programs"]))
def test_transcript_pinned(wat, shared_executor, monkeypatch):
    from ligero_prover_tpu.params import RowGeometry, SAMPLE_SIZE
    from ligero_prover_tpu.prover import prove
    from ligero_prover_tpu.zkp import transcript
    from ligero_prover_tpu.zkp.csprng import HashRandomEngine
    from ligero_prover_tpu.zkp.sampling import portable_sample
    from ligero_prover_tpu.zkp.proof import deserialize_proof
    from ligero_prover_tpu.vm.run import make_wat_program

    monkeypatch.setenv("LIGERO_PROOF_TIMESTAMP", FIXTURES["timestamp"])
    geo = RowGeometry(FIXTURES["packing"])
    ex = shared_executor(geo.k, geo.n, batch_rows=8)
    want = FIXTURES["programs"][wat]

    prog = make_wat_program(f"/root/reference/tests/{wat}",
                            [b"Ligero\x00"], set())
    res = prove(prog, geometry=geo, executor=ex,
                encoding_seed=bytes.fromhex(FIXTURES["encoding_seed"]))
    assert res.ok
    assert res.root.hex() == want["merkle_root"]
    assert res.num_rows == want["num_rows"]

    proof = deserialize_proof(res.proof)
    seed1 = transcript.stage1_seed(res.root, bytes(32))
    seed2 = transcript.stage2_seed(
        res.root, proof.encoded_code_limbs, proof.encoded_linear_limbs,
        proof.encoded_quad_limbs)
    assert seed1.hex() == want["stage1_seed"]
    assert seed2.hex() == want["stage2_seed"]
    idx = sorted(portable_sample(geo.n, SAMPLE_SIZE,
                                 HashRandomEngine(seed2)))
    assert idx[:16] == want["sample_index_first16"]

    assert len(res.proof) == want["proof_len"]
    assert hashlib.sha256(res.proof).hexdigest() == want["proof_sha256"]
