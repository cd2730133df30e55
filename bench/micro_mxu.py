#!/usr/bin/env python
"""MXU matmul rates for the NTT-as-matmul design space, + SHA absorb cost."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ligero_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, ready, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn()
    ready(out)
    t0 = time.perf_counter(); out = fn(); ready(out)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    ready(out)
    tn = time.perf_counter() - t0
    return max((tn - t1) / (iters - 1), 1e-9)


def first(o):
    return np.asarray(o[:1, :1])


def bench_mm(M, K, N, in_dtype, acc_dtype, iters=10):
    rng = np.random.default_rng(0)
    if in_dtype == jnp.int8:
        a = jnp.asarray(rng.integers(0, 127, (M, K)).astype(np.int8))
        b = jnp.asarray(rng.integers(0, 127, (K, N)).astype(np.int8))
    elif in_dtype == jnp.int16:
        a = jnp.asarray(rng.integers(0, 255, (M, K)).astype(np.int16))
        b = jnp.asarray(rng.integers(0, 255, (K, N)).astype(np.int16))
    elif in_dtype == jnp.int32:
        a = jnp.asarray(rng.integers(0, 255, (M, K)).astype(np.int32))
        b = jnp.asarray(rng.integers(0, 255, (K, N)).astype(np.int32))
    else:
        a = jnp.asarray(rng.standard_normal((M, K)), in_dtype)
        b = jnp.asarray(rng.standard_normal((K, N)), in_dtype)

    @jax.jit
    def fn(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=acc_dtype)

    dt = timeit(lambda: fn(a, b), first, iters=iters)
    return 2 * M * K * N / dt / 1e12


def main():
    out = {}
    # big square int8
    out["i8_4096^3_Tops"] = round(bench_mm(4096, 4096, 4096, jnp.int8, jnp.int32), 1)
    out["i8_8192^3_Tops"] = round(bench_mm(8192, 8192, 8192, jnp.int8, jnp.int32, iters=5), 1)
    # the L1 shape (Toeplitz 2*37R x 37R) @ (37R x C*B), R=256, C=128, B=32:
    out["i8_L1_Tops"] = round(bench_mm(18944, 9472, 4096, jnp.int8, jnp.int32, iters=5), 1)
    # skinny-N case
    out["i8_skinnyN_Tops"] = round(bench_mm(8192, 8192, 512, jnp.int8, jnp.int32), 1)
    # int16 path (may lower off-MXU)
    try:
        out["i16_4096^3_Tops"] = round(bench_mm(4096, 4096, 4096, jnp.int16, jnp.int32), 1)
    except Exception as e:  # noqa: BLE001
        out["i16_4096^3_Tops"] = f"err {type(e).__name__}"
    try:
        out["i32_2048^3_Tops"] = round(bench_mm(2048, 2048, 2048, jnp.int32, jnp.int32), 1)
    except Exception as e:  # noqa: BLE001
        out["i32_2048^3_Tops"] = f"err {type(e).__name__}"
    out["bf16_4096^3_Tflops"] = round(bench_mm(4096, 4096, 4096, jnp.bfloat16, jnp.float32), 1)

    # SHA-256 planar absorb cost at commit geometry: B=32 rows, n=32768 cols
    from ligero_prover_tpu.ops import sha256 as jsha
    B, N = 32, 32768
    state = jsha.initial_state(N)
    rng = np.random.default_rng(1)
    blocks = jnp.asarray(rng.integers(0, 2**32, (B // 2, 16, N), dtype=np.uint32))

    @jax.jit
    def absorb(state, blocks):
        def body(st, blk):
            return jsha.transform(st, blk), None
        st, _ = jax.lax.scan(body, state, blocks)
        return st

    dt = timeit(lambda: absorb(state, blocks), lambda o: np.asarray(o[:1, :1]))
    out["sha_absorb_us_per_row"] = round(dt / B * 1e6, 1)
    out["sha_absorb_rows_per_s"] = round(B / dt, 1)

    import json
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
