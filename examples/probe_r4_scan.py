"""Round-4 probe: in-scan decomposition of the production step + geometry
sweep of the column kernel. All timings via scan-length slopes (the axon
tunnel costs ~25 ms per dispatch, so single calls are meaningless)."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from particle3d_tpu.models import make_scene
from particle3d_tpu.ops.celllist_dense import (
    build_dense, dense_forces_fresh, rebind, default_mover_capacity)
from particle3d_tpu.engine.step import _dense_scan


def fence(x):
    return float(jnp.sum(x))


def slope(make_fn, n1=8, n2=24, iters=3):
    """ms per iteration via two scan lengths."""
    f1, f2 = make_fn(n1), make_fn(n2)
    fence(f1()); fence(f2())
    t0 = time.perf_counter()
    for _ in range(iters):
        fence(f1())
    t1 = (time.perf_counter() - t0) / iters
    t0 = time.perf_counter()
    for _ in range(iters):
        fence(f2())
    t2 = (time.perf_counter() - t0) / iters
    return (t2 - t1) / (n2 - n1) * 1e3


st, cfg, dt = make_scene("particle_life_large")
dt = 1.0 / 60.0
mcap = default_mover_capacity(st.n)


def kernel_scan(ds, cfg, nsc, cap, k):
    """k sweeps of the column kernel on a frozen layout (positions nudged
    per iteration so XLA cannot hoist the sweep out of the scan)."""
    @jax.jit
    def run():
        def body(pos, _):
            f = dense_forces_fresh(pos, ds, cfg, nsc, cap, interpret=False)
            return pos + 1e-30 * f, None
        out, _ = jax.lax.scan(body, ds.pos, None, length=k)
        return out
    return run


def rebind_scan(ds, cfg, nsc, cap, mcap, k):
    @jax.jit
    def run():
        def body(d, _):
            d2, _, _, _ = rebind(d, cfg, nsc, cap, mcap)
            return d2, None
        out, _ = jax.lax.scan(body, ds, None, length=k)
        return out.data
    return run


for nsc, cap in [(24, 32), (20, 64)]:
    c = cfg.replace(cell_grid=nsc, cell_capacity=cap)
    ds = jax.jit(build_dense, static_argnames=("nsc", "cap"))(
        st, c, nsc=nsc, cap=cap)
    dropped = st.n - int(jnp.sum((ds.pid >= 0).astype(jnp.int32)))
    ms_k = slope(lambda k: kernel_scan(ds, c, nsc, cap, k))
    print(f"({nsc:2d},{cap:3d}) slots={nsc**3*cap/1e3:7.0f}k "
          f"dropped={dropped:5d}  kernel {ms_k:6.2f} ms/sweep", flush=True)

# in-scan rebind + full-step decomposition at the production geometry
nsc, cap = cfg.cell_grid, cfg.cell_capacity
ds = jax.jit(build_dense, static_argnames=("nsc", "cap"))(
    st, cfg, nsc=nsc, cap=cap)
ms_r = slope(lambda k: rebind_scan(ds, cfg, nsc, cap, mcap, k))
print(f"rebind in-scan (quiescent layout): {ms_r:.2f} ms/step")


def full_scan(k):
    @jax.jit
    def run():
        out, _ = _dense_scan(ds, cfg, dt, k, nsc, cap, mcap)
        return out.data
    return run


ms_f = slope(full_scan)
print(f"full production step in-scan: {ms_f:.2f} ms/step")
