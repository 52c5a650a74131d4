"""Test configuration: emulate an 8-device CPU mesh and enable float64.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count), the JAX-native fake backend for
testing sharded FFT + all-to-all without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
