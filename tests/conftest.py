import os
import sys

# Force CPU with a virtual 8-device mesh for sharding tests; the real TPU
# is exercised only by bench.py and the CLI.
#
# The axon harness's sitecustomize calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start,
# which OVERRIDES the JAX_PLATFORMS env var — so the env var alone does
# NOT keep tests off the tunneled TPU (measured: jax.devices() still
# returns the TPU).  We set the env var for defense in depth AND re-set
# the config after importing jax, before any backend initializes; only
# then does the suite run hermetically on local CPU with 8 virtual
# devices (keeping the tunnel, its ~25 s/executable load latency, and
# its remote-compiled executables out of CI entirely — remote-compiled
# XLA:CPU code from earlier rounds carried mismatched ISA features,
# "could lead to SIGILL", the likely source of the historic
# combined-suite segfaults).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import random  # noqa: E402

# The combined suite segfaulted (rounds 2-3) inside the persistent-cache
# write path: compilation_cache.put_executable_and_time -> the `zstandard`
# C extension.  Blocking the zstandard import BEFORE jax loads makes the
# cache fall back to zlib compression, which keeps the (large) test-latency
# win of the persistent cache without the crash.
sys.modules["zstandard"] = None  # import zstandard -> ImportError

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize registers its PJRT plugin (with remote compile)
# in every python process.  Once ANY backend initializes with the plugin
# registered, even XLA:CPU executables are compiled on the remote
# terminal and come back with mismatched ISA features ("could lead to
# SIGILL" — the historic combined-suite segfaults), poisoning the
# persistent cache.  Deregister the factory BEFORE any backend
# initializes (conftest imports run before any test touches jax), then
# undo sitecustomize's jax_platforms="axon,cpu" config override.
from jax._src import xla_bridge  # noqa: E402
assert not xla_bridge.backends_are_initialized(), (
    "a backend initialized before conftest could deregister axon")
xla_bridge._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/ligero_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", (
    "tests must run on local CPU; axon plugin leaked through")
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


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
