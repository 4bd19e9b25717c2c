"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The axon sitecustomize force-sets jax_platforms="axon,cpu" via
jax.config.update, which overrides the JAX_PLATFORMS env var — so tests
must override it back through jax.config before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
