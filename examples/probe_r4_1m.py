"""Round-4 probe: 1M geometry sweep (kernel slope + initial drops) and
rebind cost at the candidate 262k geometry."""
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


def fence(x):
    return float(jnp.sum(x))


def slope(make_fn, n1=6, n2=18, iters=3):
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


def kernel_scan(ds, cfg, nsc, cap, k):
    @jax.jit
    def run(ds):
        def body(pos, _):
            f = dense_forces_fresh(pos, ds, cfg, nsc, cap, interpret=False)
            return pos + 1e-30 * f, None
        out, _ = jax.lax.scan(body, ds.pos, None, length=k)
        return out
    return lambda: run(ds)


def rebind_scan(ds, cfg, nsc, cap, mcap, k):
    @jax.jit
    def run(ds):
        def body(d, _):
            d2, _, _, _ = rebind(d, cfg, nsc, cap, mcap)
            return d2, None
        out, _ = jax.lax.scan(body, ds, None, length=k)
        return out.data
    return lambda: run(ds)


# --- 262k rebind at candidate geometry --------------------------------------
st, cfg, _ = make_scene("particle_life_large")
mcap = default_mover_capacity(st.n)
for nsc, cap in [(24, 32), (28, 32)]:
    c = cfg.replace(cell_grid=nsc, cell_capacity=cap)
    ds = jax.jit(build_dense, static_argnames=("nsc", "cap"))(
        st, c, nsc=nsc, cap=cap)
    ms_r = slope(lambda k: rebind_scan(ds, c, nsc, cap, mcap, k))
    print(f"262k ({nsc},{cap}) rebind {ms_r:.2f} ms/step", flush=True)

# --- 1M sweep ---------------------------------------------------------------
st1, cfg1, _ = make_scene("particle_life_1m")
mcap1 = default_mover_capacity(st1.n)
for nsc, cap in [(40, 32), (44, 32), (48, 16)]:
    c = cfg1.replace(cell_grid=nsc, cell_capacity=cap)
    ds = jax.jit(build_dense, static_argnames=("nsc", "cap"))(
        st1, c, nsc=nsc, cap=cap)
    dropped = st1.n - int(jnp.sum((ds.pid >= 0).astype(jnp.int32)))
    ms_k = slope(lambda k: kernel_scan(ds, c, nsc, cap, k), n1=4, n2=10)
    ms_r = slope(lambda k: rebind_scan(ds, c, nsc, cap, mcap1, k), n1=4, n2=10)
    print(f"1M ({nsc},{cap}) slots={nsc**3*cap/1e6:5.2f}M dropped={dropped:6d}"
          f"  kernel {ms_k:6.2f}  rebind {ms_r:6.2f} ms", flush=True)


# --- fixed window costs at 1M: RTT floor, build, scatter_back ---------------
from particle3d_tpu.ops.celllist_dense import scatter_back

trivial = jax.jit(lambda x: x + 1.0)


def raw(fn, iters=5):
    fence(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        fence(fn())
    return (time.perf_counter() - t0) / iters * 1e3


c = cfg1.replace(cell_grid=40, cell_capacity=32)
jb = jax.jit(build_dense, static_argnames=("nsc", "cap"))
ds = jb(st1, c, nsc=40, cap=32)
jsb = jax.jit(scatter_back)
x = jnp.ones((8, 128))
print(f"1M fixed: rtt {raw(lambda: trivial(x)):.1f} ms  "
      f"build {raw(lambda: jb(st1, c, nsc=40, cap=32).data):.1f} ms  "
      f"scatter_back {raw(lambda: jsb(ds, st1).positions):.1f} ms", flush=True)
