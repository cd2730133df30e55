#!/usr/bin/env python
"""Per-stage profile of the MXU encode pipeline at production geometry."""
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
from ligero_prover_tpu.ops import mxu_ntt as M


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
    K, N = 8192, 32768
    B = 32
    w_k, _, w_n = F.generate_omegas(K, N)
    tabs = M.build_codec_tables(K, N, w_k, w_n)
    r1, c1, r2, c2, ratio = tabs["geom"]
    rng = np.random.default_rng(0)
    out = {}

    # NTT_n level 2 matmul alone: (64*C2, 32*C2) @ (32*C2, B*R2)
    w4 = jnp.asarray(tabs["w4"])
    xd = jnp.asarray(rng.integers(-127, 127, (32 * c2, B * r2)).astype(np.int8))
    mm = jax.jit(lambda w, x: jax.lax.dot_general(
        w, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    dt = timeit(lambda: mm(w4, xd), fr)
    macs = w4.shape[0] * w4.shape[1] * xd.shape[1]
    out["L2n_matmul_ms"] = round(dt * 1e3, 2)
    out["L2n_matmul_Tops"] = round(2 * macs / dt / 1e12, 1)

    # renorm alone on the L2n slot shape (64, C2*B*R2)
    slots = jnp.asarray(
        rng.integers(-2**26, 2**26, (64, c2 * B * r2)).astype(np.int32))
    rn = jax.jit(M._renorm_slots)
    dt = timeit(lambda: rn(slots), fr)
    out["renorm_L2n_ms"] = round(dt * 1e3, 2)

    # digitize alone on (8, C2*B*R2) u32
    vals = jnp.asarray(
        rng.integers(0, 2**32, (8, c2 * B * r2)).astype(np.uint32))
    dg = jax.jit(M.digitize_planar)
    dt = timeit(lambda: dg(vals), fr)
    out["digitize_ms"] = round(dt * 1e3, 2)

    # twiddle mont on (8, R2, B, C2)
    v4 = jnp.asarray(
        rng.integers(0, 2**31, (8, r2, B, c2)).astype(np.uint32))
    tw = jax.jit(M._twiddle_mul, static_argnums=(2,))
    dt = timeit(lambda: tw(v4, tabs["tw3"], True), fr)
    out["twiddle_n_ms"] = round(dt * 1e3, 2)

    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
