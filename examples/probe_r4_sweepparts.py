"""Round-4 micro: decompose the in-scan sidecar cost at 1M into gathers /
f_mis compute / mis-mis block / f_from scatter, and test ocap scaling.
One process, median slopes (cross-process variance eats the signal)."""
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

real = OV.neighborhood_sweeps


def ablated(which):
    """Partial variants that keep upstream work live via tiny reductions."""
    def fn(positions, u_all, v_all, src_ok, mpos, mu, mv, mvalid, cfg2,
           nsc2, cap2):
        s = positions.shape[0]
        m = mpos.shape[0]
        w = jnp.asarray(cfg2.world_size, jnp.float32)
        cellw = w / nsc2
        c3 = jnp.clip(jnp.floor((mpos + w * 0.5) / cellw).astype(jnp.int32),
                      0, nsc2 - 1)
        o = jnp.arange(-1, 2, dtype=jnp.int32)
        offs = jnp.stack(jnp.meshgrid(o, o, o, indexing="ij"),
                         -1).reshape(27, 3)
        nb = jnp.remainder(c3[:, None, :] + offs[None], nsc2)
        cell = (nb[..., 0] * nsc2 + nb[..., 1]) * nsc2 + nb[..., 2]
        k = 27 * cap2
        k_cells = nsc2 ** 3

        def cells(a):
            return a.reshape(k_cells, cap2, -1)[cell].reshape(m, k, -1)

        if which == "gathers":
            pj = cells(positions)
            uj = cells(u_all)
            vj = cells(v_all)
            okj = cells(src_ok)[..., 0]
            live = (jnp.sum(pj, axis=(1, 2)) + jnp.sum(uj, axis=(1, 2))
                    + jnp.sum(vj, axis=(1, 2))
                    + jnp.sum(okj.astype(jnp.float32), axis=1))
            return (1e-30 * live)[:, None] * jnp.ones((1, 3)), \
                jnp.zeros((s, 3), jnp.float32)
        if which == "gather_pos":
            pj = cells(positions)
            live = jnp.sum(pj, axis=(1, 2))
            return (1e-30 * live)[:, None] * jnp.ones((1, 3)), \
                jnp.zeros((s, 3), jnp.float32)
        if which == "scatter_only":
            contrib = (mpos[:, None, None, :] * 1e-30) * jnp.ones(
                (1, 27, cap2, 1))
            dst = jnp.where(mvalid[:, None], cell, k_cells)
            f_from = jnp.zeros((k_cells, cap2, 3), jnp.float32).at[
                dst.reshape(-1)].add(contrib.reshape(-1, cap2, 3),
                                     mode="drop")
            return jnp.zeros((m, 3), jnp.float32), f_from.reshape(s, 3)
        raise ValueError(which)
    return fn


def scan_make_factory(ocap):
    def scan_make(k):
        ds = jax.jit(build_dense, static_argnames=("nsc", "cap", "ocap"))(
            st, cfg, nsc=nsc, cap=cap, ocap=ocap)

        @jax.jit
        def go(ds):
            out, _ = _dense_scan(ds, cfg, dt, k, nsc, cap, mcap,
                                 st.species.dtype, st.masses.dtype, ocap=ocap)
            return out.data
        return lambda: go(ds)
    return scan_make


for which in ("gather_pos", "gathers", "scatter_only"):
    OV.neighborhood_sweeps = ablated(which)
    jax.clear_caches()
    print(f"1M ocap=512 arm={which}: "
          f"{slope(scan_make_factory(512)):.2f} ms/step", flush=True)
OV.neighborhood_sweeps = real
for ocap in (128, 512):
    jax.clear_caches()
    print(f"1M ocap={ocap} full sidecar: "
          f"{slope(scan_make_factory(ocap)):.2f} ms/step", flush=True)
