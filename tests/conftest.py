"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax
import so multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config flag wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
