#!/usr/bin/env python
"""Probe the incremental-rebind cost components on the real chip.

The round-2 budget at N=262k (docs/PERF.md): kernel ~21 ms, rebind ~13 ms,
integrate + packed concat ~10 ms. The rebind is dominated by the slot-table
``jnp.nonzero`` (1-D cumsum); this probe measures the lane-parallel
replacement (``ops.compaction.masked_indices``) against it, plus the step's
other maintenance components, to validate each lever before it lands on the
production path.

Measurement: on this platform a single dispatch carries a ~29 ms host fence,
so every op is timed as the SLOPE between k1 and k2 chained in-jit
iterations (lax.fori_loop with a real data dependency) — the fence cancels.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from particle3d_tpu.models import make_scene
from particle3d_tpu.ops.celllist_dense import (
    build_dense, rebind, default_mover_capacity, bin_sid, dense_forces_fresh)
from particle3d_tpu.ops.compaction import masked_indices


def fenced(fn, *a):
    out = fn(*a)
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:8]))


def slope(make, k1=2, k2=12, iters=3):
    """Per-iteration seconds of make(k)'s inner loop via two-point slope."""
    fns = {k: jax.jit(make(k)) for k in (k1, k2)}
    t = {}
    for k, fn in fns.items():
        fenced(fn)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            fenced(fn)
        t[k] = (time.perf_counter() - t0) / iters
    return (t[k2] - t[k1]) / (k2 - k1)


def main():
    st, cfg, dt = make_scene("particle_life_large")
    nsc, cap = cfg.cell_grid, cfg.cell_capacity
    n = st.positions.shape[0]
    mcap = default_mover_capacity(n)
    ds = build_dense(st, cfg, nsc, cap)
    s_total = ds.pid.shape[0]
    print(f"N={n} nsc={nsc} cap={cap} S={s_total} mcap={mcap}")

    # a bank of realistic mover masks (~3% of slots), int8 to keep the
    # per-iteration bank slice cheap
    occupied = ds.pid >= 0
    cell_of_slot = jnp.arange(s_total, dtype=jnp.int32) // cap
    masks = jnp.stack([
        jnp.logical_and(occupied,
                        bin_sid(ds.pos + 0.02 * (i + 1), cfg, nsc)
                        != cell_of_slot).astype(jnp.int8)
        for i in range(4)])
    masks = jax.block_until_ready(masks)
    print(f"movers per probe mask: {int(jnp.sum(masks[0]))}")

    def bank_loop(op):
        def make(k):
            def fn():
                def body(i, acc):
                    m = masks[i % 4].astype(bool)
                    return acc + op(m)
                return jax.lax.fori_loop(0, k, body, jnp.int32(0))
            return fn
        return make

    nz = bank_loop(
        lambda m: jnp.nonzero(m, size=mcap, fill_value=s_total)[0][-1])
    mi = bank_loop(lambda m: masked_indices(m, mcap, s_total)[-1])
    cs = bank_loop(lambda m: jnp.cumsum(m.astype(jnp.int32))[-1])
    print(f"jnp.nonzero(S=1M)          : {slope(nz)*1e3:7.2f} ms")
    print(f"masked_indices(S=1M)       : {slope(mi)*1e3:7.2f} ms")
    print(f"  [1-D cumsum floor]       : {slope(cs)*1e3:7.2f} ms")

    # rebind end to end, chained on its own output with a drift kick so
    # movers keep appearing
    def reb_make(k):
        def fn():
            def body(i, d):
                d2, nm, _, _ = rebind(d, cfg, nsc, cap, mcap)
                drift = 0.02 * jnp.float32(1 + (i % 3))
                data = d2.data.at[:, 0:3].add(drift)
                return d2.replace(data=data)
            return jax.lax.fori_loop(0, k, body, ds)
        return fn
    print(f"rebind (end to end)        : {slope(reb_make)*1e3:7.2f} ms")

    # force path end to end (ghosting + kernel), chained via a tiny
    # force-dependent position perturbation
    def ff_make(k):
        def fn():
            def body(i, d):
                f = dense_forces_fresh(d.pos, d, cfg, nsc, cap)
                data = d.data.at[:, 0:3].add(f * 1e-30)
                return d.replace(data=data)
            return jax.lax.fori_loop(0, k, body, ds)
        return fn
    print(f"dense_forces_fresh (+chain): {slope(ff_make)*1e3:7.2f} ms")

    # ghosting alone: the concats/transposes dense_forces_fresh does before
    # the kernel call (summed to keep everything live)
    def gh_make(k):
        ncol, cs_ = nsc * nsc, nsc * cap
        def fn():
            def body(i, d):
                pos_d = d.pos.reshape(ncol, cs_, 3)
                v_d = d.v.reshape(ncol, cs_, -1)
                r2_d = d.r2.reshape(ncol, cs_)
                pos_g = jnp.concatenate(
                    [pos_d[:, cs_ - cap:], pos_d, pos_d[:, :cap]], 1)
                v_g = jnp.concatenate(
                    [v_d[:, cs_ - cap:], v_d, v_d[:, :cap]], 1)
                r2_g = jnp.concatenate(
                    [r2_d[:, cs_ - cap:], r2_d, r2_d[:, :cap]], 1)
                post = jnp.transpose(pos_g, (0, 2, 1))
                vt = jnp.transpose(v_g, (0, 2, 1))
                eps = (post[0, 0, 0] + vt[0, 0, 0] + r2_g[0, 0]) * 1e-30
                return d.replace(data=d.data.at[:, 0:3].add(eps))
            return jax.lax.fori_loop(0, k, body, ds)
        return fn
    print(f"ghost concats+transposes   : {slope(gh_make)*1e3:7.2f} ms")

    # dynamics-row data concat (the per-step [S,9] rebuild in _dense_scan)
    def cc_make(k):
        def fn():
            def body(i, d):
                data = jnp.concatenate(
                    [d.pos + 1e-6, d.vel, d.acc], axis=1)
                return d.replace(data=data)
            return jax.lax.fori_loop(0, k, body, ds)
        return fn
    print(f"[S,9] data concat          : {slope(cc_make)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
