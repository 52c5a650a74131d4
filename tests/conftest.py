"""Test configuration: emulate an 8-device CPU mesh and enable float64.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count), the JAX-native fake backend for
testing sharded FFT + all-to-all without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the image presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# A site-customization may have force-registered a TPU plugin at interpreter
# startup (overriding JAX_PLATFORMS); the config update below wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
