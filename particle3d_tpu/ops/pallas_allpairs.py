"""Tiled Pallas TPU kernel for the O(N^2) all-pairs force sweep.

This is the hot path of the framework — the TPU-native replacement for the
reference's rayon per-particle neighbor loop (``src/lib.rs:171-243``). Design
(see SURVEY.md section 7, item 4):

  * 2-D grid over (receiver tiles, outer source blocks); the output block for
    a receiver tile stays resident in VMEM across the whole source sweep and
    is accumulated in place (classic reduction grid).
  * each grid step loads a large source block into VMEM once and an inner
    ``fori_loop`` walks it in lane-aligned subtiles — amortizing grid/DMA
    overhead so the VPU stays busy on pairwise math.
  * the per-pair species/mass coupling is a rank-1 coefficient
    ``U[i] . V[j]`` computed as a ``[TI,P]x[P,TJ]`` matmul on the MXU
    (``forces.pair_features``) — no per-pair gathers.
  * periodic wrap uses the minimum-image convention, equivalent to the
    reference's 27-image sweep given ``world >= 2*radius`` (src/lib.rs:132).
  * partial accumulators are carried per-subtile as [TI, TJ] tiles and
    lane-reduced once per grid step (cheap reductions off the inner loop).

Padding rows/columns are masked by global source index; padded receiver rows
compute garbage that is sliced off on return.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from . import forces as F

# Feature dim for the rank-1 pair coefficients, padded for f32 sublane tiling.
PAIR_P = 8

# Default tile geometry (tuned for v5 VMEM: ~[TI, TJ] f32 intermediates).
DEFAULT_TI = 256
DEFAULT_TJ = 512
DEFAULT_SUBTILES = 16  # source block = TJ * SUBTILES columns per grid step


def _scale(law: str, d2, coef, pf):
    """In-kernel s = f(d)/d from the SQUARED distance (see forces.scale_fn);
    pf is the packed scalar param vector. Gravity/LJ avoid sqrt entirely."""
    if law == "particle_life":
        m = pf[2]
        d = jnp.sqrt(d2)
        repel = d / m - 1.0
        tri = coef * (1.0 - jnp.abs(2.0 * d - 1.0 - m) / (1.0 - m))
        mid = jnp.logical_and(m < d, d < 1.0)
        return jnp.where(d < m, repel, jnp.where(mid, tri, 0.0)) / d
    if law == "lennard_jones":
        eps, sig = pf[3], pf[4]
        a = sig * sig / d2
        a3 = a * a * a
        return coef * (24.0 * eps / d2) * (a3 - 2.0 * a3 * a3)
    if law == "gravity":
        g, soft = pf[5], pf[6]
        dd2 = d2 + soft * soft
        return coef * g / (dd2 * jnp.sqrt(dd2))
    if law == "spring":
        k, L = pf[7], pf[8]
        d = jnp.sqrt(d2)
        return coef * k * (d - L) / d
    raise ValueError(law)


def _kernel(pf_ref, n_ref, pos_i_ref, pos_jt_ref, u_ref, vt_ref, out_ref,
            *, law: str, wrap: bool, ti: int, tj: int, subtiles: int):
    jo = pl.program_id(1)
    w = pf_ref[0]
    r2 = pf_ref[1]
    n = n_ref[0]

    xi = pos_i_ref[:, 0:1]  # [TI, 1]
    yi = pos_i_ref[:, 1:2]
    zi = pos_i_ref[:, 2:3]
    u = u_ref[:]  # [TI, P]

    lane = jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
    j_block_base = jo * (tj * subtiles)

    def body(s, acc):
        ax, ay, az = acc
        col = pl.ds(s * tj, tj)
        xj = pos_jt_ref[0:1, col]  # [1, TJ]
        yj = pos_jt_ref[1:2, col]
        zj = pos_jt_ref[2:3, col]
        dx = xj - xi  # [TI, TJ], i -> j
        dy = yj - yi
        dz = zj - zi
        if wrap:
            dx = dx - w * jnp.round(dx / w)
            dy = dy - w * jnp.round(dy / w)
            dz = dz - w * jnp.round(dz / w)
        d2 = dx * dx + dy * dy + dz * dz
        jg = j_block_base + s * tj + lane
        valid = jnp.logical_and(jnp.logical_and(d2 > 0.0, d2 < r2), jg < n)
        coef = jnp.dot(u, vt_ref[:, col], preferred_element_type=jnp.float32)
        safe = jnp.where(valid, d2, 1.0)
        sca = jnp.where(valid, _scale(law, safe, coef, pf_ref), 0.0)
        return ax + dx * sca, ay + dy * sca, az + dz * sca

    zero = jnp.zeros((ti, tj), jnp.float32)
    ax, ay, az = jax.lax.fori_loop(0, subtiles, body, (zero, zero, zero))
    acc = jnp.concatenate(
        [
            jnp.sum(ax, axis=1, keepdims=True),
            jnp.sum(ay, axis=1, keepdims=True),
            jnp.sum(az, axis=1, keepdims=True),
        ],
        axis=1,
    )  # [TI, 3]

    @pl.when(jo == 0)
    def _():
        out_ref[:] = acc

    @pl.when(jo > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _pad_rows(a, rows):
    return jnp.pad(a, ((0, rows - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))


def _round_to(n, m):
    return -(-n // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("law", "wrap", "ti", "tj", "subtiles", "interpret"),
)
def _call(pos, u, src_pos, src_v, params_f, n_arr, law, wrap, ti, tj,
          subtiles, interpret):
    n = pos.shape[0]
    n_src = src_pos.shape[0]
    jblock = tj * subtiles
    np_i = _round_to(n, ti)
    np_j = _round_to(n_src, jblock)

    pos_p = _pad_rows(pos.astype(jnp.float32), np_i)
    u_p = _pad_rows(u.astype(jnp.float32), np_i)
    v_p = _pad_rows(src_v.astype(jnp.float32), np_j)
    pos_jt = _pad_rows(src_pos.astype(jnp.float32), np_j).T  # [3, Np_j]
    vt = v_p.T  # [P, Np_j]

    grid = (np_i // ti, np_j // jblock)
    p = u_p.shape[1]

    out = pl.pallas_call(
        functools.partial(
            _kernel, law=law, wrap=wrap, ti=ti, tj=tj, subtiles=subtiles
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params_f
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n
            pl.BlockSpec((ti, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, jblock), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, p), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, jblock), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ti, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_i, 3), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(np_i) * int(np_j) * 30,
            bytes_accessed=(int(np_i) + int(np_j)) * (3 + p) * 4 + int(np_i) * 3 * 4,
            transcendentals=int(np_i) * int(np_j),
        ),
        interpret=interpret,
    )(params_f, n_arr, pos_p, pos_jt, u_p, vt)
    return out[:n]


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def pack_params(cfg: SimConfig):
    """Scalar param vector consumed by the kernel (SMEM)."""
    return jnp.stack(
        [
            jnp.asarray(cfg.world_size, jnp.float32),
            jnp.asarray(
                cfg.particle_effect_radius * cfg.particle_effect_radius, jnp.float32
            ),
            jnp.asarray(cfg.min_pull_ratio, jnp.float32),
            jnp.asarray(cfg.lj_epsilon, jnp.float32),
            jnp.asarray(cfg.lj_sigma, jnp.float32),
            jnp.asarray(cfg.gravity_constant, jnp.float32),
            jnp.asarray(cfg.gravity_softening, jnp.float32),
            jnp.asarray(cfg.spring_stiffness, jnp.float32),
            jnp.asarray(cfg.spring_rest_length, jnp.float32),
        ]
    )


def pallas_allpairs_forces(
    positions,
    u,
    v,
    cfg: SimConfig,
    *,
    src_positions=None,
    src_v=None,
    ti: int | None = None,
    tj: int | None = None,
    subtiles: int | None = None,
    interpret: bool | None = None,
):
    """Accumulated pair forces [N,3] via the tiled TPU kernel.

    ``src_positions``/``src_v`` select a rectangular sweep (receivers vs a
    different source set) — used by the ring-sharded backend. Falls back to
    interpreter mode automatically off-TPU (tests/CI). Tile geometry shrinks
    for small N so tiny problems don't pad to 8k.
    """
    if src_positions is None:
        src_positions, src_v = positions, v
    n_src = src_positions.shape[0]
    n = positions.shape[0]
    if ti is None:
        ti = min(DEFAULT_TI, max(8, -(-n // 8) * 8))
    if tj is None:
        tj = min(DEFAULT_TJ, max(128, -(-n_src // 128) * 128))
    if subtiles is None:
        subtiles = DEFAULT_SUBTILES if n_src >= DEFAULT_TJ * DEFAULT_SUBTILES else max(
            1, min(DEFAULT_SUBTILES, n_src // tj)
        )
    if interpret is None:
        interpret = _use_interpret()
    if u.shape[1] < PAIR_P:
        pad = PAIR_P - u.shape[1]
        u = jnp.pad(u, ((0, 0), (0, pad)))
        v = jnp.pad(v, ((0, 0), (0, pad)))
        src_v = jnp.pad(src_v, ((0, 0), (0, pad))) if src_v.shape[1] < PAIR_P else src_v
    params_f = pack_params(cfg)
    n_arr = jnp.asarray([n_src], jnp.int32)
    return _call(
        positions, u, src_positions, src_v, params_f, n_arr,
        cfg.force_law, bool(cfg.wrap_forces), ti, tj, subtiles, interpret,
    )
