"""Aux subsystems: metrics, checkpointing, profiling (SURVEY.md section 5)."""

from .metrics import kinetic_energy, total_momentum, SimMetrics, measure_metrics
from .checkpoint import save_checkpoint, load_checkpoint
from .profiling import StepTimer, benchmark_steps, trace

__all__ = [
    "kinetic_energy",
    "total_momentum",
    "SimMetrics",
    "measure_metrics",
    "save_checkpoint",
    "load_checkpoint",
    "StepTimer",
    "benchmark_steps",
    "trace",
]
