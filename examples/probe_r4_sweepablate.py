"""Round-4 micro: which PART of the in-scan sidecar sweep costs the ~7 ms
floor at 1M? Monkeypatch ops.overflow.neighborhood_sweeps with ablated
variants and re-measure the production scan slope."""
import sys
import time
import statistics

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from particle3d_tpu.models import make_scene
from particle3d_tpu.engine.step import _dense_scan
from particle3d_tpu.ops.celllist_dense import build_dense, default_mover_capacity
import particle3d_tpu.ops.overflow as OV
from particle3d_tpu.ops import forces as F
from particle3d_tpu.ops.pallas_allpairs import _r2_gate


def fence(x):
    return float(jnp.sum(x))


def slope(make, k1=6, k2=18, iters=7):
    f1, f2 = make(k1), make(k2)
    fence(f1())
    fence(f2())
    t1s, t2s = [], []
    for _ in range(iters):
        t0 = time.perf_counter(); fence(f1()); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fence(f2()); t2s.append(time.perf_counter() - t0)
    return (statistics.median(t2s) - statistics.median(t1s)) / (k2 - k1) * 1e3


st, cfg, _ = make_scene("particle_life_1m")
nsc, cap = cfg.cell_grid, cfg.cell_capacity
mcap = default_mover_capacity(st.n)
dt = 1.0 / 60.0
ds = jax.jit(build_dense, static_argnames=("nsc", "cap", "ocap"))(
    st, cfg, nsc=nsc, cap=cap, ocap=512)

real = OV.neighborhood_sweeps


def ablated(which):
    def fn(positions, u_all, v_all, src_ok, mpos, mu, mv, mvalid, cfg, nsc, cap):
        s = positions.shape[0]
        m = mpos.shape[0]
        if which == "none":
            return jnp.zeros((m, 3), jnp.float32), jnp.zeros((s, 3), jnp.float32)
        f_mis, f_from = real(positions, u_all, v_all, src_ok, mpos, mu, mv,
                             mvalid, cfg, nsc, cap)
        if which == "no_from":
            return f_mis, jnp.zeros((s, 3), jnp.float32)
        if which == "from_only":
            return jnp.zeros((m, 3), jnp.float32), f_from
        return f_mis, f_from
    return fn


def scan_make(k):
    @jax.jit
    def go(ds):
        out, _ = _dense_scan(ds, cfg, dt, k, nsc, cap, mcap,
                             st.species.dtype, st.masses.dtype, ocap=512)
        return out.data
    return lambda: go(ds)


for which in ("full", "no_from", "from_only", "none"):
    OV.neighborhood_sweeps = ablated(which)
    import particle3d_tpu.engine.step as STEP
    jax.clear_caches()
    print(f"1M sidecar={which}: {slope(scan_make):.2f} ms/step", flush=True)
OV.neighborhood_sweeps = real
