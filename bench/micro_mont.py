#!/usr/bin/env python
"""Measure the real Montgomery/butterfly kernels' throughput on TPU, plus
an ILP-exposed u32 multiply rate (8 independent chains)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/ligero_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ligero_prover_tpu.ops.pallas import fieldmul as fm
from ligero_prover_tpu.ops import ntt as jntt
from ligero_prover_tpu.field import bn254 as F


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
    if isinstance(o, (tuple, list)):
        o = o[0]
    return np.asarray(o[:1, :1])


T, L = 512, 128
ROUNDS = 64


def ilp_kernel(x_ref, y_ref, o_ref):
    x = x_ref[...]
    y = y_ref[...]
    accs = [x + jnp.uint32(i) for i in range(8)]
    for _ in range(ROUNDS):
        accs = [a * y for a in accs]
    acc = accs[0]
    for a in accs[1:]:
        acc = acc ^ a
    o_ref[...] = acc


def main():
    out = {}
    x = jnp.asarray(np.random.randint(0, 2**31, (T, L), np.uint32))
    y = jnp.asarray(np.random.randint(1, 2**31, (T, L), np.uint32))
    fn = jax.jit(pl.pallas_call(
        ilp_kernel,
        out_shape=jax.ShapeDtypeStruct((T, L), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    dt = timeit(lambda: fn(x, y), first)
    out["vpu_mul_ilp8_Gops"] = round(T * L * ROUNDS * 8 / dt / 1e9, 1)

    # real planar mont_mul kernel over a large array
    P = 1 << 21   # elements
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 2**32, (8, P), dtype=np.uint32)
    ys = rng.integers(0, 2**32, (8, P), dtype=np.uint32)
    xs[7] &= 0x0FFFFFFF; ys[7] &= 0x0FFFFFFF
    xj, yj = jnp.asarray(xs), jnp.asarray(ys)
    dt = timeit(lambda: fm.mont_mul_planar(xj, yj), first)
    out["mont_mul_Melem_s"] = round(P / dt / 1e6, 2)
    out["mont_mul_eff_Gmul_s"] = round(P * 648 / dt / 1e9, 1)

    # butterfly kernel (a,b,w) -> (s,d): the NTT stage body
    dt = timeit(lambda: fm.butterfly_dit(xj, yj, yj), first)
    out["butterfly_Melem_s"] = round(P / dt / 1e6, 2)

    # one full DIT stage via the ntt stage loop glue (includes broadcast
    # of twiddles + reshapes) at B=32, N=32768 geometry
    B, N = 32, 32768
    w_k, w_2k, w_n = F.generate_omegas(8192, N)
    dom_n = jntt.build_domain_tables(N, w_n)
    rows = rng.integers(0, 2**32, (8, B, N), dtype=np.uint32)
    rows[7] &= 0x0FFFFFFF
    rj = jnp.asarray(rows)
    f = jax.jit(lambda x: jntt._cg_dit_scan_planar(x, dom_n["cg_fwd"]))
    dt = timeit(lambda: f(rj), lambda o: np.asarray(o[:1, :1, :1]))
    out["cg_dit_15stage_ms"] = round(dt * 1e3, 2)
    per_stage_elems = B * N / 2
    out["cg_dit_butterfly_Melem_s"] = round(
        15 * per_stage_elems / dt / 1e6, 2)

    import json
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
