import os

# Force CPU with a virtual 8-device mesh for sharding tests; the real TPU
# is exercised only by bench.py.
#
# CRITICAL: this must happen via the env var BEFORE jax is imported.  The
# axon harness exports JAX_PLATFORMS=axon + PALLAS_AXON_REMOTE_COMPILE=1;
# if the axon plugin activates, even "CPU" executables are compiled on a
# REMOTE machine with different CPU features (cpu_aot_loader then warns
# "could lead to SIGILL" when loading them back — the source of the
# historic combined-suite segfaults), cache loads stall for minutes, and
# process teardown can hang in native code.  Selecting cpu via
# jax.config.update() after import is NOT equivalent and still activates
# the plugin.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import random  # noqa: E402
import sys  # noqa: E402

# The combined suite segfaulted (rounds 2-3) inside the persistent-cache
# write path: compilation_cache.put_executable_and_time -> the `zstandard`
# C extension.  Blocking the zstandard import BEFORE jax loads makes the
# cache fall back to zlib compression, which keeps the (large) test-latency
# win of the persistent cache without the crash.
sys.modules["zstandard"] = None  # import zstandard -> ImportError

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/ligero_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return random.Random(1234)


_EXECUTORS = {}


@pytest.fixture(scope="session")
def shared_executor():
    """Session-cached TpuExecutor factory: avoids re-tracing jitted
    pipelines per test."""
    from ligero_prover_tpu.zkp.executor import TpuExecutor

    def get(k: int, n: int, batch_rows: int = 8):
        key = (k, n, batch_rows)
        if key not in _EXECUTORS:
            _EXECUTORS[key] = TpuExecutor(k, n, batch_rows)
        return _EXECUTORS[key]

    return get
