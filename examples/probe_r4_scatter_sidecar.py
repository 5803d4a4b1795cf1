"""Round-4 micro: (a) scatter_back variants at the 1M geometry — the
window probe measured 181 ms against the docstring's 51; find the cheap
inversion. (b) sidecar (neighborhood_apply) in-scan slope decomposition.
Run from repo root on the chip.
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
from particle3d_tpu.ops.celllist_dense import (
    build_dense, _POS, _VEL, _ACC)
from particle3d_tpu.ops.overflow import neighborhood_apply

st, cfg, _ = make_scene("particle_life_1m")
nsc, cap = cfg.cell_grid, cfg.cell_capacity
ocap = 512
ds = jax.jit(build_dense, static_argnames=("nsc", "cap", "ocap"))(
    st, cfg, nsc=nsc, cap=cap, ocap=ocap)
n = st.positions.shape[0]
s_total = ds.pid.shape[0]


def timeit(fn, iters=7):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3


# --- scatter_back variants (tunnel RTT ~25-30 ms rides on each; compare
# relative) -----------------------------------------------------------------

def gathers(inv):
    placed = inv < s_total
    safe = jnp.minimum(inv, s_total - 1)
    out = []
    for sl in (_POS, _VEL, _ACC):
        out.append(jnp.where(placed[:, None], ds.data[safe, sl], 0.0))
    return out[0] + out[1] + out[2]


@jax.jit
def var_a():  # current: big-scatter inversion
    occ = ds.pid >= 0
    idx = jnp.where(occ, ds.pid, n + jnp.arange(s_total, dtype=ds.pid.dtype))
    inv = jnp.full((n + s_total,), s_total, jnp.int32).at[idx].set(
        jnp.arange(s_total, dtype=jnp.int32), mode="promise_in_bounds",
        unique_indices=True)[:n]
    return gathers(inv)


@jax.jit
def var_b():  # argsort inversion
    occ = ds.pid >= 0
    key = jnp.where(occ, ds.pid, n)
    ord_ = jnp.argsort(key)
    inv = ord_[:n].astype(jnp.int32)
    return gathers(inv)


@jax.jit
def var_c():  # one packed scatter straight to particle rows
    occ = ds.pid >= 0
    idx = jnp.where(occ, ds.pid, n)
    out = jnp.zeros((n + 1, 9), jnp.float32).at[idx].set(
        ds.data, mode="drop")[:n]
    return out[:, 0:3] + out[:, 3:6] + out[:, 6:9]


@jax.jit
def var_d():  # small-table scatter inversion (dup-dump row at n)
    occ = ds.pid >= 0
    idx = jnp.where(occ, ds.pid, n)
    inv = jnp.full((n + 1,), s_total, jnp.int32).at[idx].set(
        jnp.arange(s_total, dtype=jnp.int32), mode="drop")[:n]
    return gathers(inv)


@jax.jit
def var_a_gather_only(inv):
    return gathers(inv)


for name, f in (("A scatter-inv (current)", var_a),
                ("B argsort-inv        ", var_b),
                ("C packed scatter      ", var_c),
                ("D small-table inv     ", var_d)):
    print(f"scatter_back {name}: {timeit(lambda: float(jnp.sum(f()))):7.1f}"
          " ms", flush=True)
inv0 = jax.jit(lambda: jnp.argsort(jnp.where(ds.pid >= 0, ds.pid, n))[
    :n].astype(jnp.int32))()
print(f"scatter_back gathers only     : "
      f"{timeit(lambda: float(jnp.sum(var_a_gather_only(inv0)))):7.1f} ms",
      flush=True)

# --- sidecar slope: full vs pieces ------------------------------------------
mis0 = jnp.full((ocap,), s_total, jnp.int32)
mis_live = mis0.at[jnp.arange(64)].set(
    jnp.arange(64, dtype=jnp.int32) * 977)  # 64 live entries


def slope(make, k1=4, k2=16, iters=5):
    f1, f2 = make(k1), make(k2)
    float(jnp.sum(f1())), float(jnp.sum(f2()))
    t1s, t2s = [], []
    for _ in range(iters):
        t0 = time.perf_counter(); float(jnp.sum(f1()))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(jnp.sum(f2()))
        t2s.append(time.perf_counter() - t0)
    return (statistics.median(t2s) - statistics.median(t1s)) / (k2 - k1) * 1e3


pos_flat = ds.pos


def make_sidecar(mis):
    def mk(k):
        @jax.jit
        def go(p):
            def body(f, x):
                m = jnp.where(mis < s_total, mis + 0 * x, mis)
                return neighborhood_apply(f, p + f * 1e-30, ds.u, ds.v,
                                          ds.r2 > 0.0, m, cfg, nsc, cap), None
            f, _ = jax.lax.scan(body, jnp.zeros_like(p),
                                jnp.arange(k, dtype=jnp.int32))
            return f
        return lambda: go(pos_flat)
    return mk


print(f"sidecar slope (empty list)   : {slope(make_sidecar(mis0)):6.2f} "
      "ms/step", flush=True)
print(f"sidecar slope (64 live)      : {slope(make_sidecar(mis_live)):6.2f} "
      "ms/step", flush=True)

# pieces: gathers only / + sweep math / + scatter
from particle3d_tpu.ops import forces as F
from particle3d_tpu.ops.pallas_allpairs import _r2_gate


def make_gathers_only(k):
    cellw = jnp.asarray(cfg.world_size, jnp.float32) / nsc
    k_cells = nsc ** 3

    @jax.jit
    def go(p):
        def body(acc, x):
            mis = jnp.where(mis0 < s_total, mis0 + 0 * x, mis0)
            msafe = jnp.minimum(mis, s_total - 1)
            mpos = p[msafe] + acc[:ocap] * 1e-30
            c3 = jnp.clip(jnp.floor(
                (mpos + cfg.world_size * 0.5) / cellw).astype(jnp.int32),
                0, nsc - 1)
            o = jnp.arange(-1, 2, dtype=jnp.int32)
            offs = jnp.stack(jnp.meshgrid(o, o, o, indexing="ij"),
                             -1).reshape(27, 3)
            nb = jnp.remainder(c3[:, None, :] + offs[None], nsc)
            cell = (nb[..., 0] * nsc + nb[..., 1]) * nsc + nb[..., 2]
            pj = p.reshape(k_cells, cap, 3)[cell]
            uj = ds.u.reshape(k_cells, cap, -1)[cell]
            vj = ds.v.reshape(k_cells, cap, -1)[cell]
            s = (jnp.sum(pj, (1, 2, 3)) + jnp.sum(uj, (1, 2, 3))
                 + jnp.sum(vj, (1, 2, 3)))
            return acc + s[:, None] * 1e-30, None
        acc, _ = jax.lax.scan(go_init := body, jnp.zeros_like(p),
                              jnp.arange(k, dtype=jnp.int32))
        return acc
    return lambda: go(pos_flat)


print(f"sidecar gathers-only slope   : {slope(make_gathers_only):6.2f} "
      "ms/step", flush=True)
