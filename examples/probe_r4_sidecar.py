"""Round-4 probe: production path with the overflow sidecar at the new
preset geometries — full in-scan per-step cost + bench-style window-16."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from particle3d_tpu.models import make_scene
from particle3d_tpu.engine.step import simulate_dense


def fence(x):
    return float(jnp.sum(x))


def timed(fn, iters=3):
    fence(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        fence(fn())
    return (time.perf_counter() - t0) / iters


for preset, wsteps in [("particle_life_large", 16), ("particle_life_1m", 16)]:
    st, cfg, _ = make_scene(preset)
    dt = 1.0 / 60.0
    t16 = timed(lambda: simulate_dense(st, cfg, dt, wsteps)[0].positions)
    t32 = timed(lambda: simulate_dense(st, cfg, dt, 2 * wsteps)[0].positions)
    slope = (t32 - t16) / wsteps
    _, (mov, mis) = simulate_dense(st, cfg, dt, wsteps)
    print(f"{preset} ({cfg.cell_grid},{cfg.cell_capacity}): "
          f"window{wsteps} {wsteps/t16:.2f} steps/s  "
          f"slope {slope*1e3:.2f} ms/step ({1/slope:.2f} steps/s)  "
          f"movers {int(mov)} masked {int(mis)}", flush=True)
