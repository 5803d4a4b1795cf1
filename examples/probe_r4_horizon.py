"""Round-4 micro, real args throughout: (1) scatter_back v3 (unique-inv +
full-row gather) vs v4 (unique packed scatter, no gather) at 1M and 262k;
(2) the 1M exactness horizon — masked count of simulate_dense windows of
16/32/48/64 steps from init at ocap 128 and 512; (3) final window-16
numbers with the reverted (4-gather) sidecar.
"""
import sys
import time
import statistics

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from particle3d_tpu.models import make_scene
from particle3d_tpu.engine.step import simulate_dense
from particle3d_tpu.ops.celllist_dense import build_dense, scatter_back


def timeit(fn, iters=7):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3


@jax.jit
def v4(pid, data, init):
    n = init.shape[0]
    s_total = pid.shape[0]
    idx = jnp.where(pid >= 0, pid, n + jnp.arange(s_total, dtype=pid.dtype))
    big = jnp.concatenate([init, jnp.zeros((s_total, 9), jnp.float32)], 0)
    return big.at[idx].set(data, mode="promise_in_bounds",
                           unique_indices=True)[:n]


for preset in ("particle_life_1m", "particle_life_large"):
    st, cfg, _ = make_scene(preset)
    nsc, cap = cfg.cell_grid, cfg.cell_capacity
    ds = jax.jit(build_dense, static_argnames=("nsc", "cap", "ocap"))(
        st, cfg, nsc=nsc, cap=cap, ocap=cfg.overflow_capacity or 512)
    n = st.positions.shape[0]
    jsb = jax.jit(scatter_back)
    t3 = timeit(lambda: float(jnp.sum(jsb(ds, st).positions)))
    init = jnp.concatenate(
        [st.positions, st.velocities, st.accel], 1).astype(jnp.float32)
    t4 = timeit(lambda: float(jnp.sum(v4(ds.pid, ds.data, init))))
    print(f"[{preset}] scatter v3 {t3:6.1f} ms   v4 {t4:6.1f} ms",
          flush=True)

# exactness horizon at 1M
st, cfg, _ = make_scene("particle_life_1m")
dt = 1.0 / 60.0
for ocap in (128, 512):
    for k in (16, 32, 48, 64):
        t0 = time.perf_counter()
        out, (mov, mis) = simulate_dense(st, cfg, dt, k, ocap=ocap)
        w = float(jnp.sum(out.positions))
        sec = time.perf_counter() - t0  # first call: includes compile
        out, (mov, mis) = simulate_dense(st, cfg, dt, k, ocap=ocap)
        t0 = time.perf_counter()
        out, (mov, mis) = simulate_dense(st, cfg, dt, k, ocap=ocap)
        float(jnp.sum(out.positions))
        sec = time.perf_counter() - t0
        print(f"[horizon oc{ocap:3d}] window-{k:2d}: {sec * 1e3:7.1f} ms "
              f"({k / sec:5.2f} steps/s)  movers={int(mov)} "
              f"masked={int(mis)}", flush=True)

# 262k final window
st, cfg, _ = make_scene("particle_life_large")
out, (mov, mis) = simulate_dense(st, cfg, dt, 16)
t = timeit(lambda: float(jnp.sum(simulate_dense(st, cfg, dt, 16)[0].positions)))
print(f"[262k] window-16 {t:6.1f} ms ({16e3 / t:.2f} steps/s) "
      f"masked={int(mis)}", flush=True)
