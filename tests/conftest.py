"""Test configuration: CPU backend with 8 virtual devices, float64.

Multi-chip sharding is tested TPU-lessly by faking an 8-device mesh on CPU
(XLA's host-platform device-count flag), the JAX answer to "test multi-node
without a cluster" (SURVEY.md section 4). float64 is required for numeric
parity with the C double reference.

The environment pre-sets JAX_PLATFORMS=axon (a tunneled TPU) and the axon
sitecustomize pins it, so the env var alone is not enough — the jax config
must be updated explicitly before any backend is created.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
