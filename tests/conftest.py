"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths (jax.sharding.Mesh) are exercised without TPU
hardware.

Note: this environment registers a remote 'axon' TPU platform via
sitecustomize and programmatically overrides JAX_PLATFORMS, so the env var
alone is not enough — we must update jax.config before any backend
initialisation. Tests must import this conftest before running jax ops
(pytest guarantees conftest loads first).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
