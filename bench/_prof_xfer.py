import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/ligero_jax_cache_tpu")
rng = np.random.default_rng(0)
for mb in (0.25, 2, 16, 64):
    nbytes = int(mb * 1e6)
    x = rng.integers(0, 2**32, nbytes // 4).astype(np.uint32)
    jax.device_put(x).block_until_ready()
    t0 = time.perf_counter(); iters = 5
    for _ in range(iters):
        jax.device_put(x).block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"h2d {mb}MB: {dt*1e3:.1f} ms  ({nbytes/dt/1e6:.0f} MB/s)")
    # device->host
    d = jax.device_put(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(d)
    dt = (time.perf_counter() - t0) / iters
    print(f"d2h {mb}MB: {dt*1e3:.1f} ms  ({nbytes/dt/1e6:.0f} MB/s)")
# dispatch latency: tiny op round trip
y = jax.device_put(np.ones((8,128), np.float32))
f = jax.jit(lambda a: a + 1)
f(y).block_until_ready()
t0 = time.perf_counter()
for _ in range(100): f(y).block_until_ready()
print(f"tiny-op roundtrip: {(time.perf_counter()-t0)/100*1e3:.2f} ms")
t0 = time.perf_counter()
r = y
for _ in range(100): r = f(r)
r.block_until_ready()
print(f"tiny-op queued: {(time.perf_counter()-t0)/100*1e3:.2f} ms")
