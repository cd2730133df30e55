import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/ligero_jax_cache_tpu")
from ligero_prover_tpu.ops.ntt import RSCodec, encode_rows
from ligero_prover_tpu.zkp.executor import TpuExecutor

K, N, B = 8192, 32768, 8
codec = RSCodec(K, N)
rng = np.random.default_rng(0)
rows = rng.integers(0, 2**32, (B, K, 8)).astype(np.uint32)
rows[..., 7] &= 0x0FFFFFFF
rows_d = jnp.asarray(rows)

enc = jax.jit(encode_rows, static_argnums=(3,))
t0=time.perf_counter()
out = enc(rows_d, codec.dom_k, codec.dom_n, N); _ = np.asarray(out[...,0,0])
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for _i in range(5):
    out = enc(rows_d, codec.dom_k, codec.dom_n, N)
    _ = np.asarray(out[..., 0, 0])
dt = (time.perf_counter() - t0) / 5
print(f"encode: {dt*1e3:.2f} ms ({B/dt:.1f} rows/s)", flush=True)

ex = TpuExecutor(K, N, batch_rows=B)
sha = ex.sha_init(N)
out = ex.commit_step(sha, rows_d, B); _ = np.asarray(out[0][...,:1])
t0 = time.perf_counter()
for _i in range(5):
    out = ex.commit_step(sha, rows_d, B)
    _ = np.asarray(out[0][..., :1])
dt = (time.perf_counter() - t0) / 5
print(f"commit_step: {dt*1e3:.2f} ms ({B/dt:.1f} rows/s)", flush=True)
