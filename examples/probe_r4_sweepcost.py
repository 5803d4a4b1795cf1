"""Round-4 micro: cost decomposition of the neighborhood sidecar sweep.

Per-call dispatch to the tunneled TPU costs ~30 ms RTT, so every variant is
iterated inside one jitted lax.scan and the per-iteration cost comes from the
(k2 - k1) slope."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from particle3d_tpu.models import make_scene
from particle3d_tpu.ops.celllist_dense import build_dense, sidecar_indices
from particle3d_tpu.ops.overflow import neighborhood_sweeps, sidecar_sweeps


def fence(x):
    return float(jnp.sum(x))


def slope(make, k1=16, k2=48, iters=5):
    f1, f2 = make(k1), make(k2)
    fence(f1())
    fence(f2())
    t0 = time.perf_counter()
    for _ in range(iters):
        fence(f1())
    t1 = (time.perf_counter() - t0) / iters
    t0 = time.perf_counter()
    for _ in range(iters):
        fence(f2())
    t2 = (time.perf_counter() - t0) / iters
    return (t2 - t1) / (k2 - k1)


st, cfg, _ = make_scene("particle_life_large")
nsc, cap = cfg.cell_grid, cfg.cell_capacity
ds = build_dense(st, cfg, nsc, cap, 512)
s_total = ds.pid.shape[0]

for m in (64, 512):
    mis = sidecar_indices(ds, m)
    mvalid = mis < s_total
    msafe = jnp.minimum(mis, s_total - 1)
    args = (ds.pos, ds.u, ds.v, ds.r2 > 0.0,
            ds.pos[msafe], ds.u[msafe], ds.v[msafe], mvalid)

    def scan_of(body):
        def make(k):
            @jax.jit
            def go():
                def it(acc, _):
                    # perturb the receiver positions so iterations can't fuse
                    a = args[0] + acc * 1e-9
                    out = body((a,) + args[1:])
                    return acc + out, None
                acc, _ = jax.lax.scan(it, jnp.float32(0.0), None, length=k)
                return acc
            return go
        return make

    def nb_full(a):
        f_mis, f_from = neighborhood_sweeps(*a, cfg, nsc, cap)
        return f_mis.sum() + f_from.sum()

    def nb_noscatter(a):
        f_mis, _ = neighborhood_sweeps(*a, cfg, nsc, cap)
        return f_mis.sum()

    def old_dense(a):
        f_mis, f_from = sidecar_sweeps(a[0], a[1], a[2], ds.pid >= 0,
                                       a[4], a[5], a[6], a[7], cfg)
        return f_mis.sum() + f_from.sum()

    print(f"m={m}: full {slope(scan_of(nb_full))*1e3:.3f} ms  "
          f"no-scatter {slope(scan_of(nb_noscatter))*1e3:.3f} ms  "
          f"old-dense {slope(scan_of(old_dense))*1e3:.3f} ms", flush=True)
