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
