"""Round-4 micro, 1M geometry: (1) packed 2-gather vs legacy 4-gather
sidecar — in-scan slope A/B at ocap=128; (2) the production carry-window
rate (simulate_dense_carry, 16-step windows, warm layout) that the bench
headline should track; (3) sort-based scatter_back timed with real args
(the earlier constant-closure micro readings were XLA folding artifacts).
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
from particle3d_tpu.engine.step import _dense_scan, simulate_dense_carry
from particle3d_tpu.ops.celllist_dense import (
    build_dense, default_mover_capacity)
import particle3d_tpu.ops.overflow as OV

st, cfg, _ = make_scene("particle_life_1m")
nsc, cap = cfg.cell_grid, cfg.cell_capacity
mcap = default_mover_capacity(st.n)
dt = 1.0 / 60.0
OCAP_AB = 128
ds = jax.jit(build_dense, static_argnames=("nsc", "cap", "ocap"))(
    st, cfg, nsc=nsc, cap=cap, ocap=OCAP_AB)
n = st.positions.shape[0]
s_total = ds.pid.shape[0]


def slope(make, k1=6, k2=18, iters=7):
    f1, f2 = make(k1), make(k2)
    float(jnp.sum(f1())), float(jnp.sum(f2()))
    t1s, t2s = [], []
    for _ in range(iters):
        t0 = time.perf_counter(); float(jnp.sum(f1()))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(jnp.sum(f2()))
        t2s.append(time.perf_counter() - t0)
    return (statistics.median(t2s) - statistics.median(t1s)) / (k2 - k1) * 1e3


def scan_make(k):
    @jax.jit
    def go(d):
        out, _ = _dense_scan(d, cfg, dt, k, nsc, cap, mcap,
                             st.species.dtype, st.masses.dtype, ocap=OCAP_AB)
        return out.data
    return lambda: float(jnp.sum(go(ds)))


real_sweeps = OV.neighborhood_sweeps


def legacy4(positions, u_all, v_all, src_ok, mpos, mu, mv, mvalid,
            cfg_, nsc_, cap_, packed=None):
    """True legacy: 3 value gathers + 1 ok gather (packed=None path but
    with separate pos / u / v / ok windows)."""
    import particle3d_tpu.ops.forces as F
    from particle3d_tpu.ops.pallas_allpairs import _r2_gate
    m = mpos.shape[0]
    scale = F.scale_fn(cfg_)
    r2 = _r2_gate(cfg_)
    w = jnp.asarray(cfg_.world_size, jnp.float32)
    mpos = mpos.astype(jnp.float32)
    mu = mu.astype(jnp.float32)
    mv = mv.astype(jnp.float32)
    cellw = w / nsc_
    c3 = jnp.clip(jnp.floor((mpos + w * 0.5) / cellw).astype(jnp.int32),
                  0, nsc_ - 1)
    o = jnp.arange(-1, 2, dtype=jnp.int32)
    offs = jnp.stack(jnp.meshgrid(o, o, o, indexing="ij"), -1).reshape(27, 3)
    nb = jnp.remainder(c3[:, None, :] + offs[None], nsc_)
    cell_ok = jnp.ones((m, 27), bool)
    cell = (nb[..., 0] * nsc_ + nb[..., 1]) * nsc_ + nb[..., 2]
    k = 27 * cap_
    k_cells = nsc_ ** 3
    ok_cell = jnp.broadcast_to(cell_ok[:, :, None],
                               (m, 27, cap_)).reshape(m, k)

    def cells(a):
        return a.reshape(k_cells, cap_, -1)[cell].reshape(m, k, -1)

    pj = cells(positions).astype(jnp.float32)
    uj = cells(u_all).astype(jnp.float32)
    vj = cells(v_all).astype(jnp.float32)
    okj = jnp.logical_and(cells(src_ok)[..., 0], ok_cell)

    delta = pj - mpos[:, None, :]
    delta = F.min_image(delta, w)
    d2 = jnp.sum(delta * delta, axis=-1)
    gate = jnp.logical_and(d2 > 0.0, d2 < r2)
    safe = jnp.where(gate, d2, 1.0)
    ok1 = jnp.logical_and(gate, okj)
    s1 = jnp.where(ok1, scale(safe, jnp.einsum("mp,mkp->mk", mu, vj)), 0.0)
    f_mis = jnp.einsum("mkc,mk->mc", delta, s1)
    dmm = mpos[None, :, :] - mpos[:, None, :]
    dmm = F.min_image(dmm, w)
    d2mm = jnp.sum(dmm * dmm, axis=-1)
    gmm = jnp.logical_and(jnp.logical_and(d2mm > 0.0, d2mm < r2),
                          mvalid[None, :])
    smm = jnp.where(gmm, scale(jnp.where(gmm, d2mm, 1.0), mu @ mv.T), 0.0)
    f_mis = f_mis + jnp.einsum("ijc,ij->ic", dmm, smm)
    ok2 = jnp.logical_and(jnp.logical_and(gate, mvalid[:, None]), okj)
    s2 = jnp.where(ok2, scale(safe, jnp.einsum("mkp,mp->mk", uj, mv)), 0.0)
    contrib = (-delta * s2[..., None]).reshape(m, 27, cap_, 3)
    gate_cell = jnp.logical_and(cell_ok, mvalid[:, None])
    dst_cell = jnp.where(gate_cell, cell, k_cells)
    f_from = jnp.zeros((k_cells, cap_, 3), jnp.float32).at[
        dst_cell.reshape(-1)].add(contrib.reshape(-1, cap_, 3), mode="drop")
    return f_mis, f_from.reshape(positions.shape[0], 3)


print(f"slope packed-2gather  oc128: {slope(scan_make):6.2f} ms/step",
      flush=True)
OV.neighborhood_sweeps = legacy4
jax.clear_caches()
print(f"slope legacy-4gather  oc128: {slope(scan_make):6.2f} ms/step",
      flush=True)
OV.neighborhood_sweeps = real_sweeps
jax.clear_caches()

# --- carry windows (the production driver) ----------------------------------
def carry_rate(windows=4):
    d = ds
    # warm: one window compiles the program
    d2, _ = simulate_dense_carry(d, cfg, dt, 16, nsc, cap, mcap,
                                 ocap=OCAP_AB)
    float(jnp.sum(d2.data))
    t0 = time.perf_counter()
    d = d2
    mx = 0
    for _ in range(windows):
        d, (mov, mis) = simulate_dense_carry(d, cfg, dt, 16, nsc, cap, mcap,
                                             ocap=OCAP_AB)
        mx = max(mx, int(mis))
    float(jnp.sum(d.data))
    sec = time.perf_counter() - t0
    return 16 * windows / sec, mx


r, mx = carry_rate()
print(f"carry windows (4x16, warm) : {r:6.2f} steps/s  max masked {mx}",
      flush=True)

# --- sort-based scatter_back with real args ---------------------------------
@jax.jit
def sb_sort(pid, data):
    key = jnp.where(pid >= 0, pid, n)
    _, out = jax.lax.sort((key, data), dimension=0, num_keys=1)
    return out[:n]


@jax.jit
def sb_scatter(pid, data):
    idx = jnp.where(pid >= 0, pid, n)
    return jnp.zeros((n + 1, 9), jnp.float32).at[idx].set(
        data, mode="drop")[:n]


def timeit(fn, iters=7):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3


pid_arg = ds.pid + 0
data_arg = ds.data + 0.0
print(f"scatter_back sort-fused    : "
      f"{timeit(lambda: float(jnp.sum(sb_sort(pid_arg, data_arg)))):7.1f} ms",
      flush=True)
print(f"scatter_back packed scatter: "
      f"{timeit(lambda: float(jnp.sum(sb_scatter(pid_arg, data_arg)))):7.1f}"
      " ms", flush=True)
