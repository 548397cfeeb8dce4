"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax
import so multi-chip sharding paths are exercised without TPU hardware.

``SOAR_TEST_TPU=1`` skips the CPU force for the (skipif-gated) real-TPU
tests, e.g.::

    SOAR_TEST_TPU=1 pytest tests/test_block_composite.py -k lowers
"""

import os

_USE_TPU = os.environ.get("SOAR_TEST_TPU", "") == "1"

if not _USE_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    # The axon TPU plugin ignores the JAX_PLATFORMS env var; the config
    # flag wins.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
