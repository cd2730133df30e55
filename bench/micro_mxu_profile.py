#!/usr/bin/env python
"""Per-stage profile of the MXU encode pipeline at production geometry.

Times each component of ``ops/mxu_ntt.encode_rows_mxu_core`` at its real
shape (k=8192, n=32768, B=32) so the encode roofline in bench.py stays
honest: three int8 matmuls (MXU), two mid renorms + final renorm
(Pallas/VPU), digitize, and the glue (unpack + transposes) by
subtraction from the full pipeline.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ligero_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ligero_prover_tpu.field import bn254 as F
from ligero_prover_tpu.ops import mxu_ntt as M
from ligero_prover_tpu.ops.pallas import mxu_renorm as mr


def timeit(fn, ready, iters=5, warmup=2):
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


def fr(o):
    if isinstance(o, (tuple, list)):
        o = o[0]
    return np.asarray(o.reshape(-1)[:1])


def main():
    K, N, B = 8192, 32768, 32
    w_k, _, w_n = F.generate_omegas(K, N)
    tabs = M.build_codec_tables(K, N, w_k, w_n)
    r1, c1, r2, c2, ratio = tabs["geom"]
    g = c2 // r1
    rng = np.random.default_rng(0)
    out = {"geom": [r1, c1, r2, c2, ratio]}

    mm = jax.jit(lambda w, x: jax.lax.dot_general(
        w, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))

    def time_mm(key, w, cols):
        wd = jnp.asarray(w)
        xd = jnp.asarray(rng.integers(-127, 127,
                                      (wd.shape[1], cols)).astype(np.int8))
        dt = timeit(lambda: mm(wd, xd), fr)
        out[f"{key}_ms"] = round(dt * 1e3, 2)
        out[f"{key}_Tops"] = round(
            2 * wd.shape[0] * wd.shape[1] * cols / dt / 1e12, 1)
        return dt

    t_mm1 = time_mm("mm1", tabs["w1"], B * c1)
    t_mm2 = time_mm("mm_wm", tabs["wm"], B * r1)
    t_mm3 = time_mm("mm_w4", tabs["w4"], B * r2)

    def time_renorm(key, fn, x_elems, with_tw):
        slots = jnp.asarray(rng.integers(-2**26, 2**26,
                                         (64, x_elems)).astype(np.int32))
        if with_tw:
            tw = jnp.asarray(rng.integers(0, 2**31,
                                          (8, x_elems)).astype(np.uint32))
            f = jax.jit(lambda s, t: fn(s, t))
            dt = timeit(lambda: f(slots, tw), fr)
        else:
            f = jax.jit(fn)
            dt = timeit(lambda: f(slots), fr)
        out[f"{key}_ms"] = round(dt * 1e3, 2)
        return dt

    t_rn1 = time_renorm("renorm_mid_k", mr.renorm_mid, B * K, True)
    t_rn2 = time_renorm("renorm_mid_n", mr.renorm_mid, B * N, True)
    t_rn3 = time_renorm("renorm_final_n", mr.renorm_final, B * N, False)

    vals = jnp.asarray(rng.integers(0, 2**31, (8, B * K)).astype(np.uint32))
    dgf = jax.jit(mr.digitize)
    t_dig = timeit(lambda: dgf(vals), fr)
    out["digitize_ms"] = round(t_dig * 1e3, 2)

    rows = jnp.asarray(rng.integers(0, 2**29, (B, K, 8)).astype(np.uint32))
    enc = jax.jit(M.encode_rows_mxu_core, static_argnums=(2, 3))
    t_full = timeit(lambda: enc(rows, tabs, N, True), fr)
    out["encode_full_ms"] = round(t_full * 1e3, 2)
    known = t_mm1 + t_mm2 + t_mm3 + t_rn1 + t_rn2 + t_rn3 + t_dig
    out["glue_ms"] = round((t_full - known) * 1e3, 2)
    out["rows_per_s"] = round(B / t_full, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
