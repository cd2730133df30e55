import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/ligero_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import sys; sys.path.insert(0, "/root/repo")
from ligero_prover_tpu.ops.ntt import RSCodec, encode_rows
from ligero_prover_tpu.ops import fieldops as fo
from ligero_prover_tpu.ops import sha256 as jsha

K, N, B = 8192, 32768, 8
codec = RSCodec(K, N)
rng = np.random.default_rng(0)
rows = rng.integers(0, 2**32, (B, K, 8)).astype(np.uint32); rows[..., 7] &= 0x0FFFFFFF
rows = jnp.asarray(rows)

def timeit(name, fn, iters=10):
    r = fn(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = fn()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms  ({B/dt:.1f} rows/s)")
    return dt

enc = jax.jit(encode_rows, static_argnums=(3,))
timeit("encode(B=8)", lambda: enc(rows, codec.dom_k, codec.dom_n, N))

# mont_mul alone on (B, N, 8)
x = rng.integers(0, 2**32, (B, N, 8)).astype(np.uint32); x[...,7] &= 0x0FFFFFFF
x = jnp.asarray(x)
mm = jax.jit(fo.mont_mul)
timeit("mont_mul(8x32768)", lambda: mm(x, x))

# sha transform over N columns
st = jsha.initial_state(N)
blk = jnp.asarray(rng.integers(0, 2**32, (16, N)).astype(np.uint32))
tr = jax.jit(jsha.transform)
timeit("sha_transform(N cols)", lambda: tr(st, blk))

# absorb of 8 rows (4 blocks)
from ligero_prover_tpu.zkp.executor import _commit_jit, TpuExecutor
ex = TpuExecutor(K, N, batch_rows=B)
sha = ex.sha_init(N)
timeit("commit_step(B=8)", lambda: ex.commit_step(sha, rows, B))
