#!/usr/bin/env python
"""Microbenchmark: raw TPU rates that bound the NTT design space.

Measures (fetch-based timing, see bench.py for why block_until_ready is
not trustworthy under the axon tunnel):
  * u32 elementwise multiply / add / shift+mask throughput on the VPU
  * u16-in-u32 digit-product throughput (the Montgomery inner op)
  * int8 x int8 -> int32 matmul throughput on the MXU
  * bf16 x bf16 -> f32 matmul throughput on the MXU
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


T, L = 256, 128          # tile (sublane-groups, lanes)
ROUNDS = 256


def make_vpu_kernel(op):
    def kernel(x_ref, y_ref, o_ref):
        x = x_ref[...]
        y = y_ref[...]
        acc = x
        for i in range(ROUNDS):
            if op == "mul":
                acc = acc * y
            elif op == "add":
                acc = acc + y
            elif op == "shiftmask":
                acc = (acc >> 16) | (y & 0xFFFF)
            elif op == "mul16":
                acc = (acc & 0xFFFF) * (y & 0xFFFF)
            elif op == "mul16r":
                # pre-masked digit product, dependent chain broken
                acc = acc + (x & 0xFFFF) * jnp.uint32(0x1234 + i)
        o_ref[...] = acc
    return kernel


def bench_vpu(op):
    x = jnp.asarray(np.random.randint(0, 2**31, (T, L), np.uint32))
    y = jnp.asarray(np.random.randint(0, 2**31, (T, L), np.uint32))
    fn = jax.jit(pl.pallas_call(
        make_vpu_kernel(op),
        out_shape=jax.ShapeDtypeStruct((T, L), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    dt = timeit(lambda: fn(x, y), lambda o: np.asarray(o[:1, :1]))
    ops = T * L * ROUNDS
    return ops / dt


def bench_mxu(dtype, M=1024, K=1024, N=1024, iters=20):
    if dtype == "int8":
        a = jnp.asarray(np.random.randint(-127, 127, (M, K), np.int8))
        b = jnp.asarray(np.random.randint(-127, 127, (K, N), np.int8))
        pt = jnp.int32
    else:
        a = jnp.asarray(np.random.randn(M, K), jnp.bfloat16)
        b = jnp.asarray(np.random.randn(K, N), jnp.bfloat16)
        pt = jnp.float32

    @jax.jit
    def fn(a, b):
        acc = None
        for _ in range(8):  # amortize dispatch
            c = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=pt)
            acc = c if acc is None else acc + c
            a = acc.astype(a.dtype) if dtype != "int8" else a
        return acc

    dt = timeit(lambda: fn(a, b), lambda o: np.asarray(o[:1, :1]),
                iters=iters)
    return 8 * 2 * M * K * N / dt


def main():
    out = {}
    for op in ("mul", "add", "shiftmask", "mul16", "mul16r"):
        r = bench_vpu(op)
        out[f"vpu_{op}_Gops"] = round(r / 1e9, 1)
    out["mxu_int8_Gops"] = round(bench_mxu("int8") / 1e9, 1)
    out["mxu_bf16_Gflops"] = round(bench_mxu("bf16") / 1e9, 1)
    import json
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
