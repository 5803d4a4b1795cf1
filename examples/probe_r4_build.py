"""Round-4 micro: build_dense cost decomposition at 1M."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from particle3d_tpu.models import make_scene
from particle3d_tpu.ops import forces as F
from particle3d_tpu.ops.celllist_dense import build_dense, bin_sid
from particle3d_tpu.ops.pallas_allpairs import PAIR_P


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
n = st.n

trivial = jax.jit(lambda x: x + 1.0)
x = jnp.ones((8, 128))
rtt = raw(lambda: trivial(x))

sid = bin_sid(st.positions, cfg, nsc)


@jax.jit
def j_argsort(sid):
    return jnp.argsort(sid)


@jax.jit
def j_sortfull(sid):
    # what build actually needs: sorted keys + the permutation
    order = jnp.argsort(sid)
    return sid[order] + order


order = j_argsort(sid)


@jax.jit
def j_pack(st_positions, st_velocities, order):
    u, v = F.pair_features(st, cfg, pad_p=PAIR_P)
    packed = jnp.concatenate(
        [st_positions.astype(jnp.float32), st_velocities.astype(jnp.float32),
         jnp.zeros_like(st_positions), u.astype(jnp.float32),
         v.astype(jnp.float32)], axis=1)
    return packed[order]


s_total = nsc ** 3 * cap


@jax.jit
def j_pidscatter(order):
    flat = jnp.where(order >= 0, order % s_total, s_total)
    pid = jnp.full((s_total + 1,), -1, jnp.int32)
    return pid.at[flat].set(order.astype(jnp.int32), mode="drop")[:-1]


jb = jax.jit(build_dense, static_argnames=("nsc", "cap"))

print(f"rtt {rtt:.1f} | argsort {raw(lambda: j_argsort(sid)):.1f} | "
      f"sort+perm {raw(lambda: j_sortfull(sid)):.1f} | "
      f"pack+gather {raw(lambda: j_pack(st.positions, st.velocities, order)):.1f} | "
      f"pid scatter {raw(lambda: j_pidscatter(order)):.1f} | "
      f"full build {raw(lambda: jb(st, cfg, nsc=nsc, cap=cap).data):.1f} ms",
      flush=True)
