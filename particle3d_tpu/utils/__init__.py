"""Aux subsystems: metrics, checkpointing, profiling (SURVEY.md section 5)."""

from .metrics import kinetic_energy, total_momentum, SimMetrics, measure_metrics
from .checkpoint import save_checkpoint, load_checkpoint
from .profiling import StepTimer, benchmark_steps, trace

# OrbaxCheckpointer is imported lazily from .orbax_ckpt (optional dependency)


def __getattr__(name):
    if name == "OrbaxCheckpointer":
        from .orbax_ckpt import OrbaxCheckpointer

        return OrbaxCheckpointer
    raise AttributeError(name)


__all__ = [
    "OrbaxCheckpointer",
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
