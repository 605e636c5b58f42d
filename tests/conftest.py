"""Test environment: force CPU JAX with a virtual 8-device mesh.

The container's sitecustomize imports jax at interpreter startup (TPU plugin
registration), so env vars alone are latched too late — use jax.config.
Backends initialize lazily, so setting XLA_FLAGS + jax_platforms here (before
any computation) still takes effect.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Reference parity targets float32 math; keep MXU-style default off for tests.
jax.config.update("jax_default_matmul_precision", "highest")
