#!/usr/bin/env python
"""Benchmark: RS-encode + SHA-256 commit throughput (rows/s per chip).

This is stage 1's hot path — per committed row: iNTT(k=8192), NTT(n=32768)
over BN254-Fr, and a 32-byte absorb into all n per-column SHA-256 states
(reference work definition: ``engine.cpp:755-771`` +
``nonbatch_context.hpp:445-451``).

The reference publishes no benchmark numbers (BASELINE.md).  `vs_baseline`
is therefore reported against a documented estimate of the reference
prover's per-row rate on a desktop-class GPU: ~35 WebGPU dispatches per
row (13+15 radix-2 stages + shared/bit-reverse/SHA kernels, one row per
encode) at ~30-100us dispatch+execution each  =>  ~300 rows/s.

Prints exactly one JSON line.
"""

import json
import time

import numpy as np

REFERENCE_ROWS_PER_S_EST = 300.0

K, N, BATCH = 8192, 32768, 8
WARMUP, ITERS = 1, 10


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ligero_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from ligero_prover_tpu.zkp.executor import TpuExecutor

    ex = TpuExecutor(K, N, batch_rows=BATCH)
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 2**32, (BATCH, K, 8)).astype(np.uint32)
    rows[..., 7] &= 0x0FFFFFFF  # keep values < p

    sha = ex.sha_init(N)
    for _ in range(WARMUP):
        sha = ex.commit_step(sha, rows, BATCH)
    sha[0].block_until_ready()

    t0 = time.perf_counter()
    for _ in range(ITERS):
        sha = ex.commit_step(sha, rows, BATCH)
    sha[0].block_until_ready()
    dt = time.perf_counter() - t0

    rows_per_s = ITERS * BATCH / dt
    print(json.dumps({
        "metric": "rs_encode_commit_rows_per_s",
        "value": round(rows_per_s, 2),
        "unit": "rows/s",
        "vs_baseline": round(rows_per_s / REFERENCE_ROWS_PER_S_EST, 3),
    }))


if __name__ == "__main__":
    main()
