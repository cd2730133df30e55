#!/usr/bin/env python
"""Benchmark: RS-encode + SHA-256 commit throughput (rows/s per chip).

Headline metric = stage 1's hot path, per committed row: iNTT(k=8192),
NTT(n=32768) over BN254-Fr, and a 32-byte absorb into all n per-column
SHA-256 states (reference work definition: ``engine.cpp:755-771`` +
``nonbatch_context.hpp:445-451``).

`vs_baseline` grades against a documented estimate of the reference
prover's per-row rate on a desktop-class GPU (~35 WebGPU dispatches per
row at ~30-100us each => ~300 rows/s; the reference publishes no numbers,
see BASELINE.md).

The headline times DEVICE-RESIDENT batches (rows pre-transferred).  In
this dev environment the chip sits behind the axon tunnel whose
host->device path measures ~39 MB/s — a ~300x slowdown vs a co-located
TPU host's PCIe/DMA, and an artifact of the tunnel, not the chip or the
kernels.  `detail.commit_rows_per_s_h2d` reports the tunnel-limited
end-to-end rate and `detail.h2d_MBps` the measured transfer bandwidth so
the gap is explicit.  The `detail` object also carries a measured
roofline:

* mult_per_row: u32 16x16-digit multiplies per row in the Montgomery
  digit convolution: 26 butterfly stages x (n_stage/2) mont_muls, each
  ~648 u32 mults (256 xy + 136 uJ + 256 mp), + SHA-256 absorb work.
* vpu_mult_peak: ~0.96e12 u32 mult/s (8x128 lanes x 940 MHz, 1 mult per
  lane-cycle) on TPU v5e — utilization = achieved mults / peak.
* hbm model: planar stage traffic ~ 2 passes x 32 B/elem per stage.

Prints exactly ONE JSON line on stdout.
"""

import json
import time

import numpy as np

REFERENCE_ROWS_PER_S_EST = 300.0

K, N = 8192, 32768
WARMUP, ITERS = 2, 10

# --- roofline model constants (TPU v5e) ---
VPU_MULT_PEAK = 0.96e12     # u32 mult/s: 1024 lanes x 940 MHz
HBM_GBPS = 819e9            # bytes/s

MULTS_PER_MONT = 648        # 256 (x*y) + 136 (u_lo*J, const) + 256 (m*p)


def mults_per_row(k: int, n: int) -> float:
    stages_k = k.bit_length() - 1
    stages_n = n.bit_length() - 1 - 2          # first log2(n/k) skipped
    butterflies = stages_k * (k // 2) + stages_n * (n // 2)
    scale = k                                   # n_inv mont-mul per element
    return (butterflies + scale) * MULTS_PER_MONT


def hbm_bytes_per_row(k: int, n: int) -> float:
    stages_k = k.bit_length() - 1
    stages_n = n.bit_length() - 1 - 2
    # each stage: read + write 32 B/element (twiddles amortized over batch)
    return stages_k * k * 64 + stages_n * n * 64


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
    detail = {}

    best_rows_per_s = 0.0
    best_batch = None
    for batch in (8, 32):
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
    rows_j = rows
    enc = jax.jit(lambda r: ex.codec.encode(r))
    dt_enc = bench(lambda: enc(rows_j),
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

    # stage-3 open pipeline
    idx = np.sort(rng.choice(N, 192, replace=False)).astype(np.int32)
    dt3 = bench(lambda: ex.open_step(rows, idx),
                lambda o: np.asarray(o[:1, :1, :1]))
    detail["open_rows_per_s"] = round(batch / dt3, 1)

    # roofline
    mpr = mults_per_row(K, N)
    detail["mult_per_row_M"] = round(mpr / 1e6, 1)
    detail["vpu_mult_util_pct"] = round(
        100.0 * best_rows_per_s * mpr / VPU_MULT_PEAK, 1)
    detail["hbm_util_pct"] = round(
        100.0 * best_rows_per_s * hbm_bytes_per_row(K, N) / HBM_GBPS, 1)
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
