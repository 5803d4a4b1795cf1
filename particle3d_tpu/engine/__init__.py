"""Simulation engine: integrators, boundaries, fused step, scan trajectories."""
