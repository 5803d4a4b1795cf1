"""Chip probe: anatomy of build_dense at the 1M preset geometry, and the
one-combined-gather variant (ROADMAP: lift the 1M window-16 all-in rate).

Arms (all jitted with REAL device-array arguments — never closed-over
constants, which XLA folds; docs/PERF.md round 4 "microbenchmark trap"):
  1. build_full      — current build_dense wall
  2. argsort         — jnp.argsort(sid) alone
  3. gather9         — packed9[safe] (data rows)
  4. gather16        — featp[safe] (feature rows)
  5. gather25        — packed25[safe] (combined row, then static slices)
  6. gather10        — packed10[safe] (data + species column; feat computed
                       on slots from the species column)

Run ON THE CHIP from repo root: python examples/probe_build_anatomy.py
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from particle3d_tpu.models import make_scene
from particle3d_tpu.ops import celllist_dense as CD
from particle3d_tpu.ops import forces as F
from particle3d_tpu.ops.pallas_allpairs import PAIR_P


def fence(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timed(fn, *args, reps=3):
    fn(*args)  # warm/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    st, cfg, dt = make_scene("particle_life_1m")
    nsc, cap = cfg.cell_grid, cfg.cell_capacity
    n = st.positions.shape[0]
    s_total = nsc ** 3 * cap
    print(f"N={n} nsc={nsc} cap={cap} S={s_total}", flush=True)

    u, v = F.pair_features(st, cfg, pad_p=PAIR_P)
    sid = CD.bin_sid(st.positions, cfg, nsc)
    order = jnp.argsort(sid)
    # a realistic safe/present pair (what build_dense derives)
    sid_s = sid[order]
    starts = jnp.searchsorted(sid_s, jnp.arange(nsc ** 3, dtype=sid.dtype))
    rank = jnp.arange(n, dtype=jnp.int32) - starts[sid_s].astype(jnp.int32)
    keep = rank < cap
    flat = jnp.where(keep, sid_s * cap + rank, nsc ** 3 * cap)
    pid = jnp.full((s_total + 1,), -1, jnp.int32)
    pid = pid.at[flat].set(order.astype(jnp.int32), mode="drop")[:-1]
    present = pid >= 0
    safe = jnp.where(present, pid, 0)

    packed9 = jnp.concatenate(
        [st.positions, st.velocities, st.accel], axis=1).astype(jnp.float32)
    featp = jnp.concatenate([u, v], axis=1).astype(jnp.float32)
    packed25 = jnp.concatenate([packed9, featp], axis=1)
    packed10 = jnp.concatenate(
        [packed9, st.species.astype(jnp.float32)[:, None]], axis=1)

    t = timed(jax.jit(lambda s: CD.build_dense(s, cfg, nsc, cap)), st)
    print(f"build_full   {t * 1e3:8.1f} ms", flush=True)
    t = timed(jax.jit(jnp.argsort), sid)
    print(f"argsort      {t * 1e3:8.1f} ms", flush=True)
    for name, arr in (("gather9", packed9), ("gather16", featp),
                      ("gather25", packed25), ("gather10", packed10)):
        t = timed(jax.jit(lambda a, i, p: jnp.where(p[:, None], a[i], 0.0)),
                  arr, safe, present)
        print(f"{name:12s} {t * 1e3:8.1f} ms", flush=True)

    # feat-from-species on slots (the compute that replaces gather16)
    amat = jnp.asarray(cfg.attraction_matrix, jnp.float32)

    def feat_from_sp(spcol, p, a):
        spi = spcol.astype(jnp.int32)
        onehot = jax.nn.one_hot(spi, a.shape[0], dtype=jnp.float32)
        uu = onehot @ a
        pad = PAIR_P - a.shape[0]
        uu = jnp.pad(uu, ((0, 0), (0, pad)))
        vv = jnp.pad(onehot, ((0, 0), (0, pad)))
        return jnp.where(p[:, None], jnp.concatenate([uu, vv], 1), 0.0)

    spcol = packed10[:, 9][safe]
    t = timed(jax.jit(feat_from_sp), spcol, present, amat)
    print(f"feat_from_sp {t * 1e3:8.1f} ms", flush=True)

    # equivalence: gather10 + feat_from_sp == build_dense's (data, feat).
    # ocap=0: the probe's safe/present derivation has no sidecar parking.
    ds = CD.build_dense(st, cfg, nsc, cap, ocap=0)
    rows10 = jnp.where(present[:, None], packed10[safe], 0.0)
    feat2 = feat_from_sp(rows10[:, 9], present, amat)
    err_d = float(jnp.max(jnp.abs(ds.data - rows10[:, :9])))
    err_f = float(jnp.max(jnp.abs(ds.feat - feat2)))
    print(f"equiv: data {err_d:.2e} feat {err_f:.2e}", flush=True)


if __name__ == "__main__":
    main()
