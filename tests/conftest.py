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
# persistent compile cache: the suite re-traces many large programs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
