#!/usr/bin/env python
"""Virtual-mesh scaling check: the sharded commit pipeline at D=1/2/4/8.

Runs on CPU with virtual devices (this host has no multi-chip TPU), so
the numbers validate FUNCTIONAL scaling — that the column-sharded
pipelines compile, the GSPMD collectives execute, and per-device work
shrinks as 1/D — not wall-clock speedup (all virtual devices share the
same cores).  On a real pod the same code spans chips over ICI.

Usage:  python bench/bench_mesh.py
Prints one JSON line per mesh size.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.modules["zstandard"] = None

import numpy as np
import jax
from jax._src import xla_bridge
xla_bridge._backend_factories.pop("axon", None)   # hermetic local CPU
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/ligero_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp  # noqa: E402

from ligero_prover_tpu.parallel.mesh import make_mesh, ShardedExecutor  # noqa: E402

K, N, B = 2048, 8192, 8


def main():
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 2**32, (B, K, 8)).astype(np.uint32)
    rows[..., 7] &= 0x0FFFFFFF
    devices = jax.devices()
    for d in (1, 2, 4, 8):
        mesh = make_mesh(devices[:d])
        ex = ShardedExecutor(K, N, mesh, batch_rows=B)
        sha = ex.sha_init(N)
        out = ex.commit_step(sha, rows, B)       # compile
        np.asarray(out[0][:1, :1])
        t0 = time.perf_counter()
        s = sha
        for _ in range(4):
            s = ex.commit_step(s, rows, B)
        np.asarray(s[0][:1, :1])
        dt = (time.perf_counter() - t0) / 4
        shards = len(out[0].sharding.device_set)
        print(json.dumps({
            "metric": "sharded_commit_rows_per_s",
            "mesh_devices": d,
            "state_shards": shards,
            "value": round(B / dt, 1),
            "unit": "rows/s (virtual CPU mesh; functional, not perf)",
        }), flush=True)


if __name__ == "__main__":
    main()
