"""Round-4 probe: decompose the 262k production step on the v5e."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from particle3d_tpu.models import make_scene
from particle3d_tpu.engine.step import simulate_dense, _dense_scan
from particle3d_tpu.ops.celllist_dense import (
    build_dense, scatter_back, dense_forces_fresh, rebind,
    default_mover_capacity)

st, cfg, dt = make_scene("particle_life_large")
nsc, cap = cfg.cell_grid, cfg.cell_capacity
mcap = default_mover_capacity(st.n)
dt = 1.0 / 60.0


def fence(x):
    return float(jnp.sum(x))


def timed(fn, iters=5):
    fence(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        fence(fn())
    return (time.perf_counter() - t0) / iters


# window cost at 16 and 32 steps -> slope + fixed
t16 = timed(lambda: simulate_dense(st, cfg, dt, 16)[0].positions, 3)
t32 = timed(lambda: simulate_dense(st, cfg, dt, 32)[0].positions, 3)
slope = (t32 - t16) / 16
fixed = t16 - slope * 16
print(f"window16 {t16*1e3:.1f} ms ({16/t16:.2f} steps/s)  "
      f"window32 {t32*1e3:.1f} ms ({32/t32:.2f} steps/s)")
print(f"per-step slope {slope*1e3:.2f} ms  fixed/window {fixed*1e3:.1f} ms")

# build / scatter_back costs
jb = jax.jit(build_dense, static_argnames=("nsc", "cap"))
ds0 = jb(st, cfg, nsc=nsc, cap=cap)
tb = timed(lambda: jb(st, cfg, nsc=nsc, cap=cap).data, 5)
print(f"build_dense {tb*1e3:.2f} ms")
jsb = jax.jit(scatter_back)
tsb = timed(lambda: jsb(ds0, st).positions, 5)
print(f"scatter_back {tsb*1e3:.2f} ms")

# kernel-only: dense_forces_fresh on the fixed layout
jf = jax.jit(dense_forces_fresh, static_argnames=("nsc", "cap", "interpret"))
tk = timed(lambda: jf(ds0.pos, ds0, cfg, nsc=nsc, cap=cap, interpret=False), 5)
print(f"dense_forces_fresh (kernel+ghosting) {tk*1e3:.2f} ms")

# rebind-only
jr = jax.jit(rebind, static_argnames=("nsc", "cap", "mcap"))
tr = timed(lambda: jr(ds0, cfg, nsc=nsc, cap=cap, mcap=mcap)[0].data, 5)
print(f"rebind {tr*1e3:.2f} ms")

# one fused scan step (step+rebind under scan, amortized)
t1 = timed(lambda: _dense_scan(ds0, cfg, dt, 8, nsc, cap, mcap)[0].data, 3)
t2 = timed(lambda: _dense_scan(ds0, cfg, dt, 16, nsc, cap, mcap)[0].data, 3)
print(f"scan8 {t1*1e3:.1f} scan16 {t2*1e3:.1f} -> per-step "
      f"{(t2-t1)/8*1e3:.2f} ms")
