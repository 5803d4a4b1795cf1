"""Make JAX_PLATFORMS authoritative for CLI entry points.

This image's sitecustomize registers the axon TPU backend at every
interpreter start and pins the platform choice after jax import, so the
env var alone does not reliably select a backend (tests/conftest.py works
around it the same way). Worse, when the TPU tunnel is down, any process
that lets jax touch the axon backend hangs in its connect-retry loop —
`JAX_PLATFORMS=cpu python -m particle3d_tpu.app.server` must never do
that. Entry points call :func:`honor_env_platforms` first thing.
"""

from __future__ import annotations

import os


def honor_env_platforms() -> None:
    """Re-assert the JAX_PLATFORMS env var as the jax platform config."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
