"""Test harness config: force CPU backend with 8 virtual devices.

Multi-chip sharding paths (pjit/shard_map over a Mesh) are exercised on a
virtual 8-device CPU mesh, per the project environment contract.

Note: the container's sitecustomize pre-imports jax with platforms
"axon,cpu" (a tunneled TPU); every dispatch there crosses the network, so
unit tests must run on local CPU.  Backend selection is lazy, so overriding
the config here (before any computation) is effective.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NO persistent compile cache: XLA:CPU AOT serialization targets the
# *compile* machine's feature set; loading such an executable on a host
# with a narrower ISA (feature-mismatch warning at startup) segfaults in
# get_executable_and_time.  In-memory jit caching is unaffected; the
# suite just re-traces per process.


import gc  # noqa: E402

import pytest  # noqa: E402


def _rss_gb() -> float:
    try:
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * 4096 / 2 ** 30
    except OSError:
        return 0.0


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules when memory grows.

    The suite accumulates hundreds of XLA:CPU executables across ~30
    modules; past ~90 tests the backing compiler has been seen to abort
    mid-compile (SIGABRT in backend_compile_and_load).  Dropping the jit
    caches at module boundaries once RSS passes a threshold keeps the
    process footprint bounded without re-tracing on small green runs.
    """
    yield
    if _rss_gb() > 2.0:
        gc.collect()
        jax.clear_caches()
