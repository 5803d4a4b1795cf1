"""Profiling & benchmarking helpers.

The reference times physics with ``Instant::now()`` around the update loop
(``src/bin/main.rs:191,203``). Here: block_until_ready-based wall timers and
``jax.profiler`` trace capture for device-level analysis.
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """Rolling wall-clock timer (EMA) for per-step host timing."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema_s: float | None = None
        self.last_s: float = 0.0
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.last_s = time.perf_counter() - self._t0
        self.ema_s = (
            self.last_s if self.ema_s is None
            else self.alpha * self.last_s + (1 - self.alpha) * self.ema_s
        )
        return False

    @property
    def ema_ms(self) -> float:
        return 1000.0 * (self.ema_s or 0.0)


def benchmark_steps(fn, *args, warmup: int = 1, iters: int = 5):
    """Time ``fn(*args)`` with proper device synchronization.

    Returns (seconds_per_call, last_result). fn must return jax arrays.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
