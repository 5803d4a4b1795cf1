"""Round-4 micro: decompose the 1M production-scan slope (40^3, cap 32)
into kernel / rebind / sidecar / integrate+concat by monkeypatching each
stage out. Slopes cancel the host fence. Run from repo root on the chip.
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
import particle3d_tpu.engine.step as STEP
import particle3d_tpu.ops.celllist_dense as CD
import particle3d_tpu.ops.overflow as OV
from particle3d_tpu.ops.celllist_dense import build_dense, \
    default_mover_capacity


def slope(make, k1=6, k2=18, iters=7):
    f1, f2 = make(k1), make(k2)
    float(jnp.sum(f1()))
    float(jnp.sum(f2()))
    t1s, t2s = [], []
    for _ in range(iters):
        t0 = time.perf_counter(); float(jnp.sum(f1()))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(jnp.sum(f2()))
        t2s.append(time.perf_counter() - t0)
    return (statistics.median(t2s) - statistics.median(t1s)) / (k2 - k1) * 1e3


st, cfg, _ = make_scene("particle_life_1m")
nsc, cap = cfg.cell_grid, cfg.cell_capacity
mcap = default_mover_capacity(st.n)
dt = 1.0 / 60.0
ocap = 512
ds = jax.jit(build_dense, static_argnames=("nsc", "cap", "ocap"))(
    st, cfg, nsc=nsc, cap=cap, ocap=ocap)

real_forces = CD.dense_forces_fresh
real_rebind = CD.rebind
real_sweeps = OV.neighborhood_sweeps


def no_kernel(pos_flat, ds_, cfg_, nsc_, cap_, interpret=None):
    return pos_flat * 1e-30


def no_rebind(ds_, cfg_, nsc_, cap_, mcap_, ocap_=None):
    s_total = ds_.pid.shape[0]
    mis = jnp.full((ocap_ or 0,), s_total, jnp.int32)
    return ds_, jnp.int32(0), jnp.int32(0), mis


def no_sweeps(positions, u_all, v_all, src_ok, mpos, mu, mv, mvalid,
              cfg_, nsc_, cap_):
    return (jnp.zeros((mpos.shape[0], 3), jnp.float32),
            jnp.zeros((positions.shape[0], 3), jnp.float32))


def scan_make(k):
    @jax.jit
    def go(d):
        out, _ = STEP._dense_scan(d, cfg, dt, k, nsc, cap, mcap,
                                  st.species.dtype, st.masses.dtype,
                                  ocap=ocap)
        return out.data
    return lambda: go(ds)


ARMS = [
    ("full", {}),
    ("no_sidecar", {"sweeps": no_sweeps}),
    ("no_rebind", {"rebind": no_rebind}),
    ("no_kernel", {"forces": no_kernel}),
    ("bare", {"forces": no_kernel, "rebind": no_rebind,
              "sweeps": no_sweeps}),
]
for name, patch in ARMS:
    CD.dense_forces_fresh = patch.get("forces", real_forces)
    CD.rebind = patch.get("rebind", real_rebind)
    OV.neighborhood_sweeps = patch.get("sweeps", real_sweeps)
    jax.clear_caches()
    print(f"1M slope arm={name:11s}: {slope(scan_make):6.2f} ms/step",
          flush=True)
CD.dense_forces_fresh = real_forces
CD.rebind = real_rebind
OV.neighborhood_sweeps = real_sweeps
