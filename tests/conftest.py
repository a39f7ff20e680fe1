"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on fake CPU devices (the XLA programs are identical modulo
backend codegen). Note: the axon TPU plugin ignores the JAX_PLATFORMS
env var, so the platform must be forced via jax.config before first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, jax.devices()
