"""Round-4 micro: where do the non-kernel non-rebind ~15 ms/step go at 1M?
Compare _dense_scan slopes with the sidecar on/off, and a no-force scan."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from particle3d_tpu.models import make_scene
from particle3d_tpu.engine.step import _dense_scan
from particle3d_tpu.ops.celllist_dense import build_dense, default_mover_capacity


def fence(x):
    return float(jnp.sum(x))


def slope(make, k1=6, k2=18, iters=7):
    import statistics
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


def scan_of(ocap):
    def make(k):
        @jax.jit
        def go(ds):
            out, _ = _dense_scan(ds, cfg, dt, k, nsc, cap, mcap,
                                 st.species.dtype, st.masses.dtype,
                                 ocap=ocap)
            return out.data
        return lambda: go(ds)
    return make


print(f"1M full ocap=512:      {slope(scan_of(512)):.2f} ms/step", flush=True)
print(f"1M ocap=0:             {slope(scan_of(0)):.2f} ms/step", flush=True)

# worklist computed in rebind, sweep skipped
import particle3d_tpu.engine.step as STEP
real_apply = STEP._sidecar_apply
STEP._sidecar_apply = lambda f, *a, **k: f
print(f"1M worklist-only:      {slope(scan_of(512)):.2f} ms/step", flush=True)
STEP._sidecar_apply = real_apply

# sweep on a CONSTANT dead worklist (no rebind coupling)
import jax.numpy as jnp2
def const_apply(f, positions, ds_, mis_idx, cfg_, valid, nsc_, cap_):
    dead = jnp2.full(mis_idx.shape, ds_.pid.shape[0], jnp2.int32)
    return real_apply(f, positions, ds_, dead, cfg_, valid, nsc_, cap_)
STEP._sidecar_apply = const_apply
print(f"1M dead-list sweep:    {slope(scan_of(512)):.2f} ms/step", flush=True)
STEP._sidecar_apply = real_apply
