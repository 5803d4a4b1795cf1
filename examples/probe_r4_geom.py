"""Round-4 geometry sweep WITH the overflow sidecar: the sidecar decouples
cell capacity from the Poisson-tail max, so low-cap/high-grid points that
were previously mask-infeasible become candidates. Per-step cost from the
(32-16)-step slope; masked must stay 0."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

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


CASES = {
    "particle_life_large": [(24, 32), (32, 16), (40, 16)],
    "particle_life_1m": [(40, 32), (48, 16), (56, 16), (64, 16)],
}

for preset, geoms in CASES.items():
    st, cfg0, _ = make_scene(preset)
    dt = 1.0 / 60.0
    for nsc, cap in geoms:
        cfg = cfg0.replace(cell_grid=nsc, cell_capacity=cap)
        try:
            t16 = timed(lambda: simulate_dense(st, cfg, dt, 16)[0].positions)
            t32 = timed(lambda: simulate_dense(st, cfg, dt, 32)[0].positions)
            _, (mov, mis) = simulate_dense(st, cfg, dt, 32)
        except Exception as e:
            print(f"{preset} ({nsc},{cap}): FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            continue
        slope = (t32 - t16) / 16
        print(f"{preset} ({nsc},{cap}): window16 {16/t16:.2f} steps/s  "
              f"slope {slope*1e3:.2f} ms/step ({1/slope:.2f} steps/s)  "
              f"movers {int(mov)} masked {int(mis)}", flush=True)
