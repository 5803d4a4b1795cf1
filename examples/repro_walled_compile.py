"""Minimal repro for the walled halo-kernel Mosaic compile-time cliff
(ROADMAP 15 / round-3 verdict item 6).

Measures fresh-compile wall time (persistent cache DISABLED) of the slab
halo column kernel at the 262k per-device geometry in three variants:

  A. periodic (halo=True, wrap=True)         — the ~1 min baseline
  B. walled   (halo=True, wrap=False)        — the ~7 min cliff; its 18
     neighbor index maps contain `jnp.where(ok, ..., dummy_col)` selects
  C. walled, select-free index maps          — same semantics, the where
     replaced by integer arithmetic ok*(idx) + (1-ok)*dummy

If B >> A but C ~ A, the where-gated index maps are the cause and C is the
fix; if C ~ B, the cliff lives elsewhere in the walled body.

Run ON THE CHIP from repo root: python examples/repro_walled_compile.py
"""
import argparse
import functools
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from particle3d_tpu.models import make_scene
from particle3d_tpu.ops.pallas_allpairs import PAIR_P, pack_params
from particle3d_tpu.ops import pallas_celllist as PC

# 262k walled-slab per-device geometry (bench.py's slab_walls gate on a
# 1-device mesh): planes = nsc = 24, cap 32. Overridable (--cap) because
# operand-shape salting does NOT bust the axon service's cache — it keys
# on the MOSAIC KERNEL (body + block shapes), which pad_rows leaves
# untouched; a fresh-compile measurement needs a never-compiled (nsc,
# cap) so the kernel hash itself is new (round-5 finding).
NSC = 24
PLANES = 24
CAP = 32


def build_call(select_free: bool, wrap: bool, pad_rows: int = 1,
               cap: int = CAP):
    ncol = PLANES * NSC
    cs = NSC * cap
    g = (NSC + 2) * cap
    zr = PC._pick_zr(NSC, cap, require_aligned=True)
    zr2 = PC._pick_zr2(zr, cap)
    dummy_col = (PLANES + 2) * NSC  # one past the real source columns

    def rec_map(c):
        return (c, 0, 0)

    def nbr_map(dx, dy):
        def im(c):
            plane = c // NSC + 1
            cy = c % NSC
            if wrap:
                return ((plane + dx) * NSC + (cy + dy) % NSC, 0, 0)
            ny = cy + dy
            if select_free:
                oki = jnp.logical_and(ny >= 0, ny < NSC).astype(jnp.int32)
                idx = oki * ((plane + dx) * NSC + ny) + (1 - oki) * dummy_col
                return (idx, 0, 0)
            ok = (ny >= 0) & (ny < NSC)
            return (jnp.where(ok, (plane + dx) * NSC + ny, dummy_col), 0, 0)
        return im

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 3, cs), rec_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, PAIR_P, cs), rec_map, memory_space=pltpu.VMEM),
    ]
    for dx, dy in PC._OFFSETS9:
        in_specs.append(pl.BlockSpec((1, 3, g), nbr_map(dx, dy),
                                     memory_space=pltpu.VMEM))
    for dx, dy in PC._OFFSETS9:
        in_specs.append(pl.BlockSpec((1, PAIR_P, g), nbr_map(dx, dy),
                                     memory_space=pltpu.VMEM))
    for dx, dy in PC._OFFSETS9:
        in_specs.append(pl.BlockSpec((1, 1, g), nbr_map(dx, dy),
                                     memory_space=pltpu.VMEM))

    # halo planes + dummy column + pad_rows EXTRA unused source columns:
    # distinct pad_rows per arm makes every arm's HLO unique, defeating the
    # axon service's remote compile cache (the first run of this repro hit
    # it — walled arms "compiled" in 0.5 s because bench.py compiles those
    # exact programs every round, while the periodic arm's accidentally
    # novel shape paid a fresh 587 s compile)
    nsrc = (PLANES + 2) * NSC + pad_rows

    def fwd(pos_d, u_d, post_g, vt_g, r2_g, params_f):
        return pl.pallas_call(
            functools.partial(
                PC._kernel, law="particle_life", wrap=wrap, halo=True,
                nsc=NSC, cap=cap, zr=zr, zr2=zr2, use_rsqrt=True),
            grid=(ncol,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 3, cs), rec_map,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ncol, 3, cs), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(params_f, pos_d, u_d, *([post_g] * 9), *([vt_g] * 9),
          *([r2_g] * 9))

    k = jax.random.PRNGKey(0)
    ncolr = ncol
    args = (
        jax.random.normal(k, (ncolr, 3, cs), jnp.float32),
        jax.random.normal(k, (ncolr, PAIR_P, cs), jnp.float32),
        jax.random.normal(k, (nsrc, 3, g), jnp.float32),
        jax.random.normal(k, (nsrc, PAIR_P, g), jnp.float32),
        jnp.full((nsrc, 1, g), -1.0, jnp.float32),
        pack_params(make_scene("particle_life_large")[1]),
    )
    return fwd, args


def main():
    # Fresh Mosaic compiles: no persistent cache — AND a never-compiled
    # geometry. Round-5 finding: operand-shape salting (runtime-random
    # pad_rows) still measured ~2 s "compiles" for all three arms — the
    # axon service's cache keys on the MOSAIC KERNEL (body constants +
    # block shapes), which pad_rows leaves untouched. Only a new (nsc,
    # cap) produces a new kernel hash; pass --cap with a capacity no
    # bench/probe has ever used (zr*cap % 128 == 0 with zr | 24).
    p = argparse.ArgumentParser()
    p.add_argument("--cap", type=int, default=CAP)
    a = p.parse_args()
    jax.config.update("jax_compilation_cache_dir", None)
    base = 7 + int(time.time()) % 4000
    print(f"[salt] pad_rows base {base}, cap {a.cap}", flush=True)
    for name, select_free, wrap, pad in (
            ("A periodic          ", False, True, base),
            ("B walled where-maps ", False, False, base + 1),
            ("C walled select-free", True, False, base + 2)):
        fwd, args = build_call(select_free, wrap, pad_rows=pad, cap=a.cap)
        t0 = time.perf_counter()
        lowered = jax.jit(fwd).lower(*args).compile()
        dt_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(lowered(*args)))
        dt_r = time.perf_counter() - t0
        print(f"[{name}] compile {dt_c:7.1f} s   first-run {dt_r:6.2f} s",
              flush=True)
        jax.clear_caches()


if __name__ == "__main__":
    main()
