"""Boundary handling.

Three modes (cfg.boundary):

  * ``wrap``    — periodic box, single wrap per axis. Reference behavior for
                  ``walls == false`` (``src/lib.rs:79-81`` etc.). Positions
                  more than one box length out remain out, matching the
                  reference's single-subtraction wrap.
  * ``clamp``   — the reference's ``walls == true`` rule
                  (``src/lib.rs:74-78``): clamp position to the face and kill
                  only the escaping velocity component (one-sided min/max,
                  no restitution).
  * ``reflect`` — elastic walls (extension, per BASELINE config 2): mirror
                  the position across the face and reverse the component with
                  restitution cfg.restitution.

All are pure elementwise ``jnp.where`` chains — branch-free, fusible.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimConfig


def apply_boundary(positions, velocities, cfg: SimConfig):
    w = cfg.world_size
    hw = w * 0.5
    over = positions > hw
    under = positions < -hw
    if cfg.boundary == "wrap":
        positions = jnp.where(over, positions - w, jnp.where(under, positions + w, positions))
        return positions, velocities
    if cfg.boundary == "clamp":
        new_pos = jnp.where(over, hw, jnp.where(under, -hw, positions))
        new_vel = jnp.where(
            over,
            jnp.minimum(velocities, 0.0),
            jnp.where(under, jnp.maximum(velocities, 0.0), velocities),
        )
        return new_pos, new_vel
    if cfg.boundary == "reflect":
        e = cfg.restitution
        new_pos = jnp.where(over, 2.0 * hw - positions, jnp.where(under, -2.0 * hw - positions, positions))
        hit = jnp.logical_or(over, under)
        new_vel = jnp.where(hit, -e * velocities, velocities)
        # A very fast particle could still be outside after one mirror;
        # clamp as a backstop so the invariant |x| <= hw holds.
        new_pos = jnp.clip(new_pos, -hw, hw)
        return new_pos, new_vel
    raise ValueError(f"unknown boundary {cfg.boundary!r}")
