"""Round-4 micro: decompose the 1M bench window (simulate_dense, 16 steps)
into build_dense / scan slope / scatter_back / fixed residue, on the real
chip. The bench headline is 16/sec16; the slope alone is the marginal
steps/s. Run from repo root: python examples/probe_r4_1mwindow.py
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
from particle3d_tpu.engine.step import simulate_dense, _dense_scan
from particle3d_tpu.ops.celllist_dense import (
    build_dense, scatter_back, default_mover_capacity)


def fence(x):
    return float(jnp.sum(x[0].positions if isinstance(x, tuple) else x))


def timeit(fn, iters=7):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3


def main():
    st, cfg, _ = make_scene("particle_life_1m")
    nsc, cap = cfg.cell_grid, cfg.cell_capacity
    mcap = default_mover_capacity(st.n)
    dt = 1.0 / 60.0
    ocap = 512
    print(f"geometry nsc={nsc} cap={cap} slots={nsc**3*cap/1e6:.2f}M "
          f"mcap={mcap}", flush=True)

    jb = jax.jit(build_dense, static_argnames=("nsc", "cap", "ocap"))
    ds = jb(st, cfg, nsc=nsc, cap=cap, ocap=ocap)
    t_build = timeit(lambda: float(jnp.sum(jb(st, cfg, nsc=nsc, cap=cap,
                                              ocap=ocap).data)))
    print(f"build_dense              : {t_build:7.1f} ms", flush=True)

    jsb = jax.jit(scatter_back)
    t_scat = timeit(lambda: float(jnp.sum(jsb(ds, st).positions)))
    print(f"scatter_back             : {t_scat:7.1f} ms", flush=True)

    def scan_make(k):
        @jax.jit
        def go(d):
            out, _ = _dense_scan(d, cfg, dt, k, nsc, cap, mcap,
                                 st.species.dtype, st.masses.dtype,
                                 ocap=ocap)
            return out.data
        return lambda: float(jnp.sum(go(ds)))

    f6, f18 = scan_make(6), scan_make(18)
    f6(); f18()
    t6, t18 = [], []
    for _ in range(7):
        t0 = time.perf_counter(); f6(); t6.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); f18(); t18.append(time.perf_counter() - t0)
    slope = (statistics.median(t18) - statistics.median(t6)) / 12 * 1e3
    base6 = statistics.median(t6) * 1e3
    print(f"scan slope               : {slope:7.2f} ms/step "
          f"({1e3 / slope:.2f} steps/s marginal)", flush=True)
    print(f"scan(6) total            : {base6:7.1f} ms "
          f"(fixed-in-scan {base6 - 6 * slope:.1f} ms)", flush=True)

    def window():
        out, (mov, mis) = simulate_dense(st, cfg, dt, 16)
        return float(jnp.sum(out.positions)) + float(mis) * 0

    t_win = timeit(window)
    print(f"bench window (16 steps)  : {t_win:7.1f} ms = "
          f"{16e3 / t_win:.2f} steps/s window", flush=True)
    print(f"residue (win - build - scat - 16*slope): "
          f"{t_win - t_build - t_scat - 16 * slope:7.1f} ms", flush=True)
    out, (mov, mis) = simulate_dense(st, cfg, dt, 16)
    print(f"movers={int(mov)} masked={int(mis)}", flush=True)


if __name__ == "__main__":
    main()
