"""Capture a jax.profiler trace of the production step (SURVEY §5 tracing).

Writes a TensorBoard-loadable trace of K production steps (incremental
dense cell layout at the 262k preset by default) plus the component-level
wall-clock breakdown measured with host-forced fences.

    python examples/profile_step.py --trace-dir /tmp/p3t_trace
    tensorboard --logdir /tmp/p3t_trace   # -> Profile tab

The round-2 measured budget at N=262k on a v5e (see docs/PERF.md): column
kernel ~21 ms, incremental rebind ~13 ms (dominated by the slot-table
nonzero + binning, not the mover scatters), integrate + packed-row concat
~10 ms.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="particle_life_large")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--trace-dir", default="/tmp/p3t_trace")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    from particle3d_tpu.models import make_scene
    from particle3d_tpu.engine.step import simulate_dense

    st, cfg, dt = make_scene(a.preset)
    dt = jnp.float32(dt)

    # warm (compile outside the trace)
    out, _ = simulate_dense(st, cfg, dt, a.steps)
    jax.block_until_ready(out.positions)

    with jax.profiler.trace(a.trace_dir):
        out, diag = simulate_dense(st, cfg, dt, a.steps)
        jax.block_until_ready(out.positions)
    print(f"trace written to {a.trace_dir}")

    t0 = time.perf_counter()
    out, _ = simulate_dense(st, cfg, dt, a.steps)
    float(jnp.sum(out.positions))  # host-forced fence (docs/PERF.md)
    sec = time.perf_counter() - t0
    print(f"{a.steps} steps in {sec*1e3:.1f} ms = "
          f"{sec/a.steps*1e3:.1f} ms/step ({a.steps/sec:.1f} steps/s)")


if __name__ == "__main__":
    main()
