"""Regenerate tests/fixtures/transcripts.json (golden transcript pins).

Run manually after an INTENTIONAL protocol change:
    python tests/gen_fixtures.py
and commit the diff.  test_fixtures.py asserts against these values so
any unintentional change to randomness draw order, commit order, mask
construction, Fiat-Shamir derivation, or proof serialization fails CI
(the reference's only non-derived randomness is the encoding seed,
``webgpu_prover.cpp:242-245``, which is injected here).
"""
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

FIXTURE_PROGRAMS = ["i32_add.wat", "i32_mul.wat", "i64_shr_s.wat"]
ENCODING_SEED = bytes(range(32))
TIMESTAMP = "1700000000"
ARGS = [b"Ligero\x00"]


def main():
    os.environ["LIGERO_PROOF_TIMESTAMP"] = TIMESTAMP
    from ligero_prover_tpu.params import RowGeometry, SAMPLE_SIZE
    from ligero_prover_tpu.prover import prove
    from ligero_prover_tpu.zkp.executor import TpuExecutor
    from ligero_prover_tpu.zkp import transcript
    from ligero_prover_tpu.zkp.csprng import HashRandomEngine
    from ligero_prover_tpu.zkp.sampling import portable_sample
    from ligero_prover_tpu.zkp.proof import deserialize_proof
    from ligero_prover_tpu.vm.run import make_wat_program

    geo = RowGeometry(256)
    ex = TpuExecutor(geo.k, geo.n, batch_rows=8)
    out = {}
    for wat in FIXTURE_PROGRAMS:
        prog = make_wat_program(f"/root/reference/tests/{wat}", ARGS, set())
        res = prove(prog, geometry=geo, executor=ex,
                    encoding_seed=ENCODING_SEED)
        assert res.ok, wat
        proof = deserialize_proof(res.proof)
        seed1 = transcript.stage1_seed(res.root, bytes(32))
        seed2 = transcript.stage2_seed(
            res.root, proof.encoded_code_limbs, proof.encoded_linear_limbs,
            proof.encoded_quad_limbs)
        idx = sorted(portable_sample(geo.n, SAMPLE_SIZE,
                                     HashRandomEngine(seed2)))
        out[wat] = {
            "merkle_root": res.root.hex(),
            "stage1_seed": seed1.hex(),
            "stage2_seed": seed2.hex(),
            "sample_index_first16": idx[:16],
            "num_rows": res.num_rows,
            "proof_sha256": hashlib.sha256(res.proof).hexdigest(),
            "proof_len": len(res.proof),
        }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "transcripts.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump({"encoding_seed": ENCODING_SEED.hex(),
                   "timestamp": TIMESTAMP,
                   "packing": 256,
                   "programs": out}, f, indent=1, sort_keys=True)
    print("wrote", path)
    for k, v in out.items():
        print(k, v["proof_sha256"][:16], v["num_rows"])


if __name__ == "__main__":
    main()
