"""Morton-order cell layout: the locality experiment (ROADMAP round-1 #9).

A Morton (x,y)-interleaved column order could only speed the column-sweep
cell kernel through better HBM locality of the 9 neighbor-column DMAs. This
script measures that sensitivity directly: it times the production kernel
with (a) the real adjacent-neighbor index map and (b) a scrambled map that
reads the SAME number of same-sized column blocks from maximally non-local
addresses ((x*17+5) mod nsc). If (b) is not slower than (a), neighbor-column
locality does not matter at this block size (~100 KB sequential DMAs) and a
Morton layout cannot pay for its power-of-two padding (nsc=40 -> 64^2 codes,
2.6x more grid columns).

Run on a TPU: python examples/morton_experiment.py
Result (v5e, N=262k, nsc=40, cap=16): see docs/PERF.md "Morton layout:
measured and rejected".
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from particle3d_tpu.models import make_scene
from particle3d_tpu.ops import forces as F
from particle3d_tpu.ops.pallas_celllist import (
    _kernel, _pick_zr, prepare_columns, _OFFSETS9)
from particle3d_tpu.ops.pallas_allpairs import pack_params


def call_with_map(pos_d, u_d, post_g, vt_g, r2_g, params_f, nsc, cap,
                  scramble: bool):
    ncol = pos_d.shape[0]
    cs = nsc * cap
    g = (nsc + 2) * cap
    p = u_d.shape[2]
    zr = _pick_zr(nsc, cap)

    def rec_map(c):
        return (c, 0, 0)

    def nbr_map(dx, dy):
        def im(c):
            cx = c // nsc
            cy = c % nsc
            if scramble:  # same block count/size, non-local addresses
                cx = (cx * 17 + 5) % nsc
                cy = (cy * 29 + 11) % nsc
            return (((cx + dx) % nsc) * nsc + (cy + dy) % nsc, 0, 0)

        return im

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, cs, 3), rec_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cs, p), rec_map, memory_space=pltpu.VMEM)]
    for dx, dy in _OFFSETS9:
        in_specs.append(pl.BlockSpec((1, 3, g), nbr_map(dx, dy),
                                     memory_space=pltpu.VMEM))
    for dx, dy in _OFFSETS9:
        in_specs.append(pl.BlockSpec((1, p, g), nbr_map(dx, dy),
                                     memory_space=pltpu.VMEM))
    for dx, dy in _OFFSETS9:
        in_specs.append(pl.BlockSpec((1, 1, g), nbr_map(dx, dy),
                                     memory_space=pltpu.VMEM))
    args = [params_f, pos_d, u_d] + [post_g] * 9 + [vt_g] * 9 + [r2_g] * 9
    return pl.pallas_call(
        functools.partial(_kernel, law="particle_life", wrap=True, nsc=nsc,
                          cap=cap, zr=zr, use_rsqrt=True),
        grid=(ncol,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, cs, 3), rec_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ncol, cs, 3), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=False,
    )(*args)


def main():
    st, cfg, _ = make_scene("particle_life_large")
    nsc, cap = cfg.cell_grid, cfg.cell_capacity
    u, v = F.pair_features(st, cfg, pad_p=8)
    pos_d, u_d, post_g, vt_g, r2_g, _ = jax.jit(
        lambda p: prepare_columns(p, u, v, cfg, nsc, cap))(st.positions)
    params = pack_params(cfg)

    def timed(fn, iters=5):
        float(jnp.sum(fn()))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(jnp.sum(fn()))
        return (time.perf_counter() - t0) / iters

    for scramble in (False, True):
        f = jax.jit(lambda: call_with_map(
            pos_d, u_d, post_g, vt_g, r2_g, params, nsc, cap, scramble))
        print(f"kernel scramble={scramble}: {timed(f)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
