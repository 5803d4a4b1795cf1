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
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """XLA:CPU segfaults once enough distinct programs accumulate in one
    process (backend_compile_and_load crashes mid-suite; order-dependent,
    any module passes solo). Round 3 hit it at the first test_pallas_mxu
    interpret-mode compile and fixed it with a module-local cache clear;
    round 4's new programs moved the crash earlier (test_fuzz_backends),
    so the clear now runs at EVERY module boundary. Costs some duplicate
    compiles; keeps the one-process full suite green."""
    jax.clear_caches()
    yield
