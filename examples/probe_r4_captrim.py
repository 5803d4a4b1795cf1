"""Round-4 micro: (1) re-measure the 1M window with the packed-scatter
scatter_back and 2-gather sidecar; (2) the misaligned-capacity experiment —
does Mosaic accept the UNROLLED z loop at (40, 28), is it equivalent, and
what does the slope do; (3) 262k window re-measure. Run on the chip.
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


def timeit(fn, iters=7):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3


def window_probe(tag, preset, cap_override=None, ocap=512):
    st, cfg, _ = make_scene(preset)
    nsc = cfg.cell_grid
    cap = cap_override or cfg.cell_capacity
    if cap_override:
        cfg = cfg.replace(cell_capacity=cap_override)
    mcap = default_mover_capacity(st.n)
    dt = 1.0 / 60.0

    jb = jax.jit(build_dense, static_argnames=("nsc", "cap", "ocap"))
    ds = jb(st, cfg, nsc=nsc, cap=cap, ocap=ocap)
    t_build = timeit(lambda: float(jnp.sum(jb(st, cfg, nsc=nsc, cap=cap,
                                              ocap=ocap).data)))
    jsb = jax.jit(scatter_back)
    t_scat = timeit(lambda: float(jnp.sum(jsb(ds, st).positions)))

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

    def window():
        out, (mov, mis) = simulate_dense(st, cfg, dt, 16, cap=cap, ocap=ocap)
        return float(jnp.sum(out.positions)) + float(mis) * 0

    t_win = timeit(window)
    out, (mov, mis) = simulate_dense(st, cfg, dt, 16, cap=cap, ocap=ocap)
    print(f"[{tag}] build {t_build:6.1f}  scatter {t_scat:6.1f}  "
          f"slope {slope:6.2f} ms/step  window16 {t_win:7.1f} ms "
          f"({16e3 / t_win:5.2f} steps/s)  movers={int(mov)} "
          f"masked={int(mis)}", flush=True)
    return out


# 1M baseline geometry with the new scatter/sidecar
o32 = window_probe("1M cap32       ", "particle_life_1m")

# ocap budget trim (live queue ~21 at the uniform 1M phase)
window_probe("1M cap32 oc128 ", "particle_life_1m", ocap=128)

# misaligned capacity via the unrolled z loop
try:
    o28 = window_probe("1M cap28 UNROLL", "particle_life_1m", cap_override=28)
    num = float(jnp.max(jnp.abs(o28.positions - o32.positions)))
    den = float(jnp.max(jnp.abs(o32.positions)))
    print(f"[equiv] cap28 vs cap32 16-step max abs pos diff: {num:.3e} "
          f"(scale {den:.3e})", flush=True)
except Exception as e:
    print(f"[1M cap28 UNROLL] FAILED: {type(e).__name__}: "
          f"{str(e)[:300]}", flush=True)

try:
    window_probe("1M cap26 UNROLL", "particle_life_1m", cap_override=26)
except Exception as e:
    print(f"[1M cap26 UNROLL] FAILED: {type(e).__name__}: "
          f"{str(e)[:300]}", flush=True)

# 262k re-measure (aligned path, new scatter/sidecar)
window_probe("262k cap32     ", "particle_life_large")
