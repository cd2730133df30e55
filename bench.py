#!/usr/bin/env python
"""Benchmark: RS-encode + SHA-256 commit throughput (rows/s per chip).

Headline metric = stage 1's hot path, per committed row: iNTT(k=8192),
NTT(n=32768) over BN254-Fr, and a 32-byte absorb into all n per-column
SHA-256 states (reference work definition: ``engine.cpp:755-771`` +
``nonbatch_context.hpp:445-451``).

Engine: the MXU int8-matmul NTT (``ops/mxu_ntt.py``) — three exact
digit matmuls per encode (15.0 G MACs/row) plus Pallas REDC/twiddle
renormalization and the SHA absorb on the VPU.

`vs_baseline` grades against a documented estimate of the reference
prover's per-row rate on a desktop-class GPU (~35 WebGPU dispatches per
row at ~30-100us each => ~300 rows/s; the reference publishes no
numbers, see BASELINE.md).

Roofline (all rates measured on this chip, bench/micro_*.py):
* MXU int8: 395 Tops measured at the level-matmul shapes -> the 15.0
  G MACs/row cost 76 us/row at peak.
* VPU: ~2.5 T u32-ops/s effective (the Montgomery kernel's measured
  rate; raw u32 multiply is ~0.1 Tops — the 0.96 Tops "peak" used
  before round 5 was wrong by ~10x).  The irreducible per-row VPU work
  (REDC+twiddle renorms ~310 M ops, SHA absorb ~47 M ops) bounds
  commit at ~143 us/row ≈ 7.0 k rows/s; `vpu_bound_util_pct` reports
  achieved/bound.

The headline times DEVICE-RESIDENT batches (rows pre-transferred); in
this dev environment the chip sits behind the axon tunnel whose
host->device path measures ~40 MB/s (an artifact of the tunnel —
`detail.h2d_MBps` keeps it visible).

Prints exactly ONE JSON line on stdout.
"""

import json
import time

import numpy as np

REFERENCE_ROWS_PER_S_EST = 300.0

K, N = 8192, 32768
WARMUP, ITERS = 2, 10

MXU_TOPS_MEAS = 395e12          # bench/micro_mxu.py on this chip
VPU_OPS_MEAS = 2.5e12           # mont kernel effective rate, micro_mont.py

# per-row work model for the MXU engine (see ops/mxu_ntt.py):
#   mm1  (64*128 x 32*128) @ (.., 64)  = 2.1 G MACs
#   wm   (64*256 x 32*64)  @ (.., 128) = 4.3 G
#   w4   (64*128 x 32*128) @ (.., 256) = 8.6 G
MACS_PER_ROW = 15.0e9
# VPU: renorm_mid(k) 5500*8192 + renorm_mid(n) 5500*32768 +
#      renorm_final(n) 2600*32768 + SHA absorb ~1440*32768
VPU_OPS_PER_ROW = 357e6


def bench(fn, ready, iters=ITERS, warmup=WARMUP):
    """Marginal per-iteration wall time.

    `ready` must perform a real device->host FETCH (np.asarray of a small
    slice), not just block_until_ready: under the axon TPU tunnel,
    block_until_ready returns at enqueue time, which over-reports
    throughput by orders of magnitude (measured round 4).  The fetch
    latency itself is cancelled by differencing a 1-iter and an
    `iters`-iter run.
    """
    for _ in range(warmup):
        out = fn()
    ready(out)
    t0 = time.perf_counter()
    out = fn()
    ready(out)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    ready(out)
    tn = time.perf_counter() - t0
    return max((tn - t1) / (iters - 1), 1e-9)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ligero_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ligero_prover_tpu.zkp.executor import TpuExecutor

    rng = np.random.default_rng(0)
    detail = {"engine": "mxu-int8-matmul"}

    best_rows_per_s = 0.0
    best_batch = None
    for batch in (16, 32):
        ex = TpuExecutor(K, N, batch_rows=batch)
        rows_np = rng.integers(0, 2**32, (batch, K, 8)).astype(np.uint32)
        rows_np[..., 7] &= 0x0FFFFFFF  # keep values < p
        rows = jnp.asarray(rows_np)   # device-resident (see docstring)
        sha = ex.sha_init(N)
        dt = bench(lambda: ex.commit_step(sha, rows, batch),
                   lambda out: np.asarray(out[0][:1, :1]))
        rps = batch / dt
        detail[f"commit_rows_per_s_b{batch}"] = round(rps, 1)
        if rps > best_rows_per_s:
            best_rows_per_s, best_batch, best_ex = rps, batch, ex
            best_rows_np = rows_np

    # tunnel-limited end-to-end (numpy in, incl. host->device transfer)
    ex = best_ex
    sha = ex.sha_init(N)
    dt_h2d = bench(lambda: ex.commit_step(sha, best_rows_np, best_batch),
                   lambda out: np.asarray(out[0][:1, :1]), iters=5)
    detail["commit_rows_per_s_h2d"] = round(best_batch / dt_h2d, 1)
    t0 = time.perf_counter()
    for _ in range(3):
        jnp.asarray(best_rows_np).block_until_ready()
    detail["h2d_MBps"] = round(
        3 * best_rows_np.nbytes / (time.perf_counter() - t0) / 1e6, 1)

    # component split at the best batch size
    ex, batch = best_ex, best_batch
    rows = jnp.asarray(best_rows_np)
    from ligero_prover_tpu.ops.mxu_ntt import encode_rows_mxu_core
    enc = jax.jit(encode_rows_mxu_core, static_argnums=(2, 3))
    tabs = ex.codec.mxu_tabs
    dt_enc = bench(lambda: enc(rows, tabs, N, True),
                   lambda o: np.asarray(o[:1, :1, :1]))
    detail["encode_rows_per_s"] = round(batch / dt_enc, 1)

    # stage-2 check pipeline
    rands = jnp.zeros((batch, K, 8), jnp.uint32)
    code_rs = rng.integers(0, 2**31, (batch, 8)).astype(np.uint32)
    tri_idx = np.zeros((batch, 3), np.int32)
    tri_r = np.zeros((batch, 8), np.uint32)
    pair_idx = np.zeros((batch, 2), np.int32)
    pair_r = np.zeros((batch, 8), np.uint32)
    z = jnp.zeros((N, 8), jnp.uint32)
    accs = (z, z, z)
    dt2 = bench(lambda: ex.check_step(accs, rows, rands, code_rs, tri_idx,
                                      tri_r, pair_idx, pair_r),
                lambda o: np.asarray(o[0][:1, :1]))
    detail["check_rows_per_s"] = round(batch / dt2, 1)
    # batch-row flushes (vbn254fr/bit/equal/quadratic hooks) carry no
    # linear-randomness rows; the rands_zero jit variant skips the second
    # encode + linear accumulation entirely
    dt2z = bench(lambda: ex.check_step(accs, rows, rands, code_rs, tri_idx,
                                       tri_r, pair_idx, pair_r,
                                       rands_zero=True),
                 lambda o: np.asarray(o[0][:1, :1]))
    detail["check_batchrow_rows_per_s"] = round(batch / dt2z, 1)

    # stage-3 open pipeline
    idx = np.sort(rng.choice(N, 192, replace=False)).astype(np.int32)
    dt3 = bench(lambda: ex.open_step(rows, idx),
                lambda o: np.asarray(o[:1, :1, :1]))
    detail["open_rows_per_s"] = round(batch / dt3, 1)

    # full prover device throughput: rows/s through all three stages
    full = 1.0 / (1.0 / best_rows_per_s +
                  dt2 / batch + dt3 / batch)
    detail["prover_3stage_rows_per_s"] = round(full, 1)

    # end-to-end prove at production geometry: a vbn254fr Poseidon-style
    # round loop (bench/e2e_prove.py's guest) through the REAL pipeline —
    # interpreter + witness manager + batched device stages + row-tape
    # stage-3 replay.  Measures the front-end share VERDICT r4 flagged.
    try:
        from bench.e2e_prove import make_wat
        from ligero_prover_tpu.params import RowGeometry
        from ligero_prover_tpu.prover import prove
        from ligero_prover_tpu.vm.run import make_wat_program
        rounds = 400
        prog = make_wat_program(make_wat(rounds), [], set())
        geometry = RowGeometry(k=K)
        prove(prog, geometry=geometry, encoding_seed=bytes(32))  # warm jits
        t0 = time.perf_counter()
        res = prove(prog, geometry=geometry, encoding_seed=bytes(32))
        e2e_wall = time.perf_counter() - t0
        assert res.ok
        detail["prove_e2e_rows_per_s"] = round(res.num_rows / e2e_wall, 1)
        detail["prove_e2e_rows"] = res.num_rows
    except Exception as e:  # never lose the headline to the e2e add-on
        detail["prove_e2e_error"] = repr(e)[:120]

    # roofline
    detail["mxu_macs_per_row_G"] = round(MACS_PER_ROW / 1e9, 1)
    detail["mxu_util_pct"] = round(
        100.0 * best_rows_per_s * 2 * MACS_PER_ROW / MXU_TOPS_MEAS, 1)
    vpu_bound = VPU_OPS_MEAS / VPU_OPS_PER_ROW
    detail["vpu_bound_rows_per_s"] = round(vpu_bound, 1)
    detail["vpu_bound_util_pct"] = round(
        100.0 * best_rows_per_s / vpu_bound, 1)
    detail["best_batch"] = best_batch

    print(json.dumps({
        "metric": "rs_encode_commit_rows_per_s",
        "value": round(best_rows_per_s, 2),
        "unit": "rows/s",
        "vs_baseline": round(best_rows_per_s / REFERENCE_ROWS_PER_S_EST, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
