#!/usr/bin/env python
"""MXU encode pipeline vs VPU encode at production geometry on TPU."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ligero_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ligero_prover_tpu.field import bn254 as F
from ligero_prover_tpu.ops import ntt as jntt
from ligero_prover_tpu.ops import mxu_ntt


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


def main():
    K, N = 8192, 32768
    B = int(os.environ.get("B", "32"))
    w_k, w_2k, w_n = F.generate_omegas(K, N)
    t0 = time.perf_counter()
    tabs = mxu_ntt.build_codec_tables(K, N, w_k, w_n)
    print(f"table build: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    rows_np = rng.integers(0, 2**32, (B, K, 8)).astype(np.uint32)
    rows_np[..., 7] &= 0x0FFFFFFF
    rows = jnp.asarray(rows_np)

    enc = jax.jit(mxu_ntt.encode_rows_mxu_core, static_argnums=(2, 3))
    t0 = time.perf_counter()
    out = enc(rows, tabs, N, True)
    np.asarray(out[:1, :1, :1])
    print(f"mxu compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    dt = timeit(lambda: enc(rows, tabs, N, True),
                lambda o: np.asarray(o[:1, :1, :1]))
    res = {"mxu_encode_rows_per_s": round(B / dt, 1),
           "mxu_encode_us_per_row": round(dt / B * 1e6, 1)}

    # VPU reference at same batch
    codec = jntt.RSCodec(K, N)
    dt2 = timeit(lambda: codec.encode(rows),
                 lambda o: np.asarray(o[:1, :1, :1]))
    res["vpu_encode_rows_per_s"] = round(B / dt2, 1)

    # correctness spot check on TPU
    small = rows[:2]
    a = np.asarray(jnp.moveaxis(enc(small, tabs, N, True), 0, -1))
    b = np.asarray(codec.encode(small))
    res["match"] = bool((a == b).all())

    import json
    print(json.dumps(res))


if __name__ == "__main__":
    main()
