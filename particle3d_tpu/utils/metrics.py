"""Structured per-step metrics.

The reference's entire observability story is three egui labels (FPS, frame
time, physics update time — ``src/bin/main.rs:253-258``). Here: on-device
physics diagnostics (kinetic energy, momentum, speed stats) computed in one
fused reduction, plus host-side counters (steps/s, pair-interactions/s).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..state import ParticleState


def kinetic_energy(state: ParticleState):
    return 0.5 * jnp.sum(state.masses * jnp.sum(state.velocities ** 2, axis=-1))


def total_momentum(state: ParticleState):
    return jnp.sum(state.masses[:, None] * state.velocities, axis=0)


@dataclasses.dataclass(frozen=True)
class SimMetrics:
    kinetic_energy: Any
    momentum: Any  # [3]
    max_speed: Any
    mean_speed: Any
    com: Any  # center of mass [3]

    def as_dict(self):
        return {
            "kinetic_energy": float(self.kinetic_energy),
            "momentum": [float(x) for x in self.momentum],
            "max_speed": float(self.max_speed),
            "mean_speed": float(self.mean_speed),
            "com": [float(x) for x in self.com],
        }


jax.tree_util.register_dataclass(
    SimMetrics,
    data_fields=["kinetic_energy", "momentum", "max_speed", "mean_speed", "com"],
    meta_fields=[],
)


@jax.jit
def measure_metrics(state: ParticleState) -> SimMetrics:
    speed = jnp.linalg.norm(state.velocities, axis=-1)
    m = state.masses
    return SimMetrics(
        kinetic_energy=kinetic_energy(state),
        momentum=total_momentum(state),
        max_speed=jnp.max(speed),
        mean_speed=jnp.mean(speed),
        com=jnp.sum(m[:, None] * state.positions, axis=0) / jnp.sum(m),
    )
