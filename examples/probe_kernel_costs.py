#!/usr/bin/env python
"""Probe per-feature costs of the all-pairs kernel on the real chip:
wrap on/off, force law, coef matmul, to find where the VPU budget goes."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from particle3d_tpu import SimConfig, reference_config, init_scene, from_numpy
from particle3d_tpu.ops import forces as F
from particle3d_tpu.ops.pallas_allpairs import pallas_allpairs_forces


def timed(fn, iters=3):
    float(jnp.sum(fn()))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.sum(fn()))
    return (time.perf_counter() - t0) / iters


def main():
    n = 262144
    base = reference_config(world_size=40.0)
    st = init_scene(jax.random.PRNGKey(0), n, base)
    pairs = float(n) * float(n)

    variants = {
        "particle_life wrap": base,
        "particle_life nowrap": base.replace(wrap_forces=False),
        "gravity wrap": SimConfig(
            force_law="gravity", world_size=40.0, particle_effect_radius=2.0,
            gravity_softening=0.1).validate(),
        "gravity nowrap": SimConfig(
            force_law="gravity", world_size=40.0, particle_effect_radius=2.0,
            gravity_softening=0.1, wrap_forces=False).validate(),
        "spring nowrap": SimConfig(
            force_law="spring", world_size=40.0, particle_effect_radius=2.0,
            wrap_forces=False).validate(),
    }
    for name, cfg in variants.items():
        u, v = F.pair_features(st, cfg)
        el = timed(lambda: pallas_allpairs_forces(st.positions, u, v, cfg))
        print(f"{name:24s}: {el*1e3:8.1f} ms  {pairs/el:.3e} pairs/s")


if __name__ == "__main__":
    main()
