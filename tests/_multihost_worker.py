"""Worker process for tests/test_multihost.py.

Each of the two processes owns 4 virtual CPU devices; together they form
one 8-device global mesh (2 hosts x 4 devices — the DCN/ICI shape of a
real multi-host TPU pod slice).  Every process runs the identical
deterministic prover; the column-sharded pipelines span both processes
(GSPMD inserts the cross-host collectives) and `ShardedExecutor.fetch`
replicates pipeline outputs so each host derives the same Fiat-Shamir
transcript.  The worker prints `RESULT <root> <proof-sha256> <ok>` for the
launcher to compare across processes.

Usage: python _multihost_worker.py <pid> <nproc> <port>
"""

import hashlib
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()
    # same axon-deregistration dance as tests/conftest.py
    sys.modules["zstandard"] = None
    import jax
    from jax._src import xla_bridge
    xla_bridge._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.device_count() == 4 * nproc, jax.devices()
    assert jax.local_device_count() == 4

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ligero_prover_tpu.params import RowGeometry
    from ligero_prover_tpu.prover import prove
    from ligero_prover_tpu.parallel.mesh import make_mesh
    from ligero_prover_tpu.vm.run import make_wat_program

    os.environ["LIGERO_PROOF_TIMESTAMP"] = "1700000000"
    mesh = make_mesh(jax.devices())        # global 2-process mesh
    geo = RowGeometry(256)
    seed = bytes(range(32))
    prog = make_wat_program("/root/reference/tests/i32_add.wat",
                            [b"Ligero\x00"], set())
    res = prove(prog, geometry=geo, mesh=mesh, batch_rows=8,
                encoding_seed=seed)
    print(f"RESULT {res.root.hex()} "
          f"{hashlib.sha256(res.proof).hexdigest()} {res.ok}", flush=True)


if __name__ == "__main__":
    main()
