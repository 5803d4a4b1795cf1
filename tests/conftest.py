"""Test harness config: run everything on a virtual 8-device CPU mesh so
sharding tests exercise real collectives without TPU hardware."""

import os

# Force CPU even when the environment points JAX at a TPU/axon platform:
# tests must be runnable anywhere, and the sharding tests need 8 devices.
# jax may already be imported (sitecustomize), so set the config directly
# too — the env var alone is only read at jax import time.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
