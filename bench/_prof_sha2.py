import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/ligero_jax_cache_tpu")
import sys; sys.path.insert(0, "/root/repo")
from ligero_prover_tpu.ops import sha256 as jsha
import hashlib

N = 32768
rng = np.random.default_rng(1)
blk = rng.integers(0, 2**32, (16, N)).astype(np.uint32)
st = jsha.initial_state(N)
blk_d = jnp.asarray(blk)

ur = jax.jit(jsha.transform_unrolled)
ro = jax.jit(jsha.transform_rolled)
a = np.asarray(ur(st, blk_d)); b = np.asarray(ro(st, blk_d))
print("unrolled == rolled:", np.array_equal(a, b))
# golden single column vs hashlib mid-state equivalent: compare via full digest path later; rolled is already test-covered.

for name, fn in (("unrolled", ur), ("rolled", ro)):
    fn(st, blk_d).block_until_ready()
    t0 = time.perf_counter()
    r = st
    for _ in range(20): r = fn(r, blk_d)
    r.block_until_ready()
    print(f"{name}: {(time.perf_counter()-t0)/20*1e3:.3f} ms")
