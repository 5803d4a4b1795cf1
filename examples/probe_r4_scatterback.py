"""Round-4 micro: scatter_back / build_dense scatter strategies at 1M.

XLA TPU scatter cost scales with INDEX COUNT, not element count (the block-
scatter fix in ops/overflow.py). Candidates to replace the [S]-indexed
3-array scatter in scatter_back:
  a) current: 3x f32[S,3] .at[idx].set into [n+1,3]
  b) unique:  same but duplicate-free indices (empty slots -> distinct dump
     rows) + unique_indices=True
  c) inv:     ONE int32 [S] scatter (unique) to build particle->slot, then
     3 gathers
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from particle3d_tpu.models import make_scene
from particle3d_tpu.ops.celllist_dense import build_dense, _POS, _VEL, _ACC


def fence(x):
    return float(jnp.sum(x))


def raw(fn, iters=5):
    fence(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        fence(fn())
    return (time.perf_counter() - t0) / iters * 1e3


st, cfg, _ = make_scene("particle_life_1m")
nsc, cap = cfg.cell_grid, cfg.cell_capacity
ds = jax.jit(build_dense, static_argnames=("nsc", "cap"))(
    st, cfg, nsc=nsc, cap=cap)
n = st.n
s_total = ds.pid.shape[0]

trivial = jax.jit(lambda x: x + 1.0)
x = jnp.ones((8, 128))
rtt = raw(lambda: trivial(x))


@jax.jit
def back_a(ds):
    occ = ds.pid >= 0
    idx = jnp.where(occ, ds.pid, n)
    outs = []
    for sl in (_POS, _VEL, _ACC):
        outs.append(jnp.zeros((n + 1, 3), jnp.float32).at[idx].set(
            ds.data[:, sl], mode="drop")[:n])
    return outs[0]


@jax.jit
def back_b(ds):
    occ = ds.pid >= 0
    # duplicate-free: empty slot i dumps to row n + i
    idx = jnp.where(occ, ds.pid, n + jnp.arange(s_total, dtype=ds.pid.dtype))
    outs = []
    for sl in (_POS, _VEL, _ACC):
        outs.append(jnp.zeros((n + s_total, 3), jnp.float32).at[idx].set(
            ds.data[:, sl], mode="promise_in_bounds",
            unique_indices=True)[:n])
    return outs[0]


@jax.jit
def back_c(ds):
    occ = ds.pid >= 0
    idx = jnp.where(occ, ds.pid, n + jnp.arange(s_total, dtype=ds.pid.dtype))
    inv = jnp.zeros((n + s_total,), jnp.int32).at[idx].set(
        jnp.arange(s_total, dtype=jnp.int32), mode="promise_in_bounds",
        unique_indices=True)[:n]
    outs = []
    for sl in (_POS, _VEL, _ACC):
        outs.append(ds.data[inv, sl])
    return outs[0]


ra = raw(lambda: back_a(ds))
rb = raw(lambda: back_b(ds))
rc = raw(lambda: back_c(ds))
# equivalence
pa = np.asarray(back_a(ds))
pb = np.asarray(back_b(ds))
pc = np.asarray(back_c(ds))
print(f"rtt {rtt:.1f} ms | a(current) {ra:.1f}  b(unique set) {rb:.1f}  "
      f"c(inv+gather) {rc:.1f} ms", flush=True)
print("b==a:", np.array_equal(pa, pb), " c==a:", np.array_equal(pa, pc),
      flush=True)
