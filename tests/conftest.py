"""Test configuration: run all JAX on a virtual 8-device CPU mesh.

This is the standard JAX trick for testing multi-chip sharding logic without a
TPU pod (SURVEY.md §4): force the host CPU platform and split it into 8
virtual devices. Must run before jax initializes.
"""

import os

# The environment pins JAX_PLATFORMS=axon (TPU tunnel); override hard so unit
# tests compile locally on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
