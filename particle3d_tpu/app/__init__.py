"""App shell: simulation driver with fixed-timestep loop, live controls,
headless video export, and a browser UI."""

from .driver import SimulationApp

__all__ = ["SimulationApp"]
