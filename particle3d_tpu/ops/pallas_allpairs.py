"""Tiled Pallas TPU kernel for the O(N^2) all-pairs force sweep.

This is the hot path of the framework — the TPU-native replacement for the
reference's rayon per-particle neighbor loop (``src/lib.rs:171-243``). Design
(see SURVEY.md section 7, item 4):

  * 2-D grid over (receiver tiles, outer source blocks); the output block for
    a receiver tile stays resident in VMEM across the whole source sweep and
    is accumulated in place (classic reduction grid — the source dimension is
    the innermost/fastest grid axis, so revisits are consecutive).
  * each grid step loads a large source block into VMEM once and an inner
    ``fori_loop`` walks it in lane-aligned subtiles — amortizing grid/DMA
    overhead so the VPU stays busy on pairwise math.
  * the per-pair species/mass coupling is a rank-1 coefficient
    ``U[i] . V[j]`` computed as a ``[TI,P]x[P,TJ]`` matmul on the MXU
    (``forces.pair_features``) — no per-pair gathers.
  * periodic wrap uses the minimum-image convention, equivalent to the
    reference's 27-image sweep given ``world >= 2*radius`` (src/lib.rs:132).
  * VPU op-count discipline: the padding mask and radius gate are folded into
    one streamed per-source row ``r2row`` (r^2 for real sources, -1 for
    padding — one compare replaces iota+add+compare+and); for particle-life
    the cutoff is also clamped to 1.0 (force is zero at raw distance >= 1,
    reference quirk Q2, src/lib.rs:59) which removes the d<1 test from the
    triangular branch; reciprocal scalars are precomputed outside.
  * partial accumulators are carried per-subtile as [TI, TJ] tiles and
    lane-reduced once per grid step (cheap reductions off the inner loop).

Padding receiver rows compute garbage that is sliced off on return; padded
source columns are killed by ``r2row = -1``.
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

# Default tile geometry (tuned on v5e; see examples/tune_pallas.py).
DEFAULT_TI = 256
DEFAULT_TJ = 512
DEFAULT_SUBTILES = 16  # source block = TJ * SUBTILES columns per grid step

# packed scalar param layout (SMEM)
_PF_W = 0        # world size
_PF_INV_W = 1    # 1 / world
_PF_M = 2        # min_pull_ratio
_PF_INV_M = 3    # 1 / min_pull_ratio
_PF_INV_1M = 4   # 1 / (1 - min_pull_ratio)   (kept for layout stability;
_PF_C1M = 5      # 1 + min_pull_ratio          superseded by _PF_T2/_PF_TC)
_PF_LJ24E = 6    # 24 * lj_epsilon
_PF_LJ_S2 = 7    # lj_sigma^2
_PF_G = 8        # gravity constant
_PF_G_S2 = 9     # gravity softening^2
_PF_K = 10       # spring stiffness
_PF_L = 11       # spring rest length
_PF_T2 = 12      # 2 / (1 - min_pull_ratio)   (triangular shape, folded)
_PF_TC = 13      # (1 + min_pull_ratio) / (1 - min_pull_ratio)
_PF_LEN = 14


def _inv_sqrt(d2, use_rsqrt: bool):
    """(inv_d, d). TPU's rsqrt is accurate; interpret/CPU mode uses exact
    sqrt + divide (XLA CPU rsqrt is a coarse approximation)."""
    if use_rsqrt:
        inv_d = jax.lax.rsqrt(d2)
        return inv_d, d2 * inv_d
    d = jnp.sqrt(d2)
    return 1.0 / d, d


def _scale(law: str, d2, coef, pf, valid, use_rsqrt: bool):
    """masked s = f(d)/d from the SQUARED distance (see forces.scale_fn).

    For particle-life, masked-out pairs arrive with d2 == 1.0 exactly (the
    ``safe`` park value): the triangular kernel is identically zero at d=1
    (and coef*0 at d==m belongs to neither strict branch in the reference —
    quirk Q2), so no final mask multiply is needed; the d<m branch is only
    reachable for real in-range pairs because the park value 1.0 > m.
    """
    if law == "particle_life":
        inv_d, d = _inv_sqrt(d2, use_rsqrt)
        # repulsion (d < m): f/d = (d/m - 1)/d = 1/m - 1/d
        rep = pf[_PF_INV_M] - inv_d
        # triangular (m <= d): zero at d=m and at d>=1 by construction;
        # folded form 1 - |d*2/(1-m) - (1+m)/(1-m)| (one fewer VPU pass);
        # clamp at 0 so park/no-force pairs cannot go negative
        tri = coef * (jnp.maximum(
            1.0 - jnp.abs(d * pf[_PF_T2] - pf[_PF_TC]), 0.0) * inv_d)
        return jnp.where(d < pf[_PF_M], rep, tri)
    if law == "lennard_jones":
        inv_d2 = 1.0 / d2
        a = pf[_PF_LJ_S2] * inv_d2
        a3 = a * a * a
        s = coef * (pf[_PF_LJ24E] * inv_d2) * (a3 - 2.0 * a3 * a3)
        return jnp.where(valid, s, 0.0)
    if law == "gravity":
        dd2 = d2 + pf[_PF_G_S2]
        inv, _ = _inv_sqrt(dd2, use_rsqrt)
        s = coef * pf[_PF_G] * (inv * inv * inv)
        return jnp.where(valid, s, 0.0)
    if law == "spring":
        inv_d, d = _inv_sqrt(d2, use_rsqrt)
        s = coef * pf[_PF_K] * (1.0 - pf[_PF_L] * inv_d)
        return jnp.where(valid, s, 0.0)
    raise ValueError(law)


def _kernel(pf_ref, pos_i_ref, pos_jt_ref, u_ref, vt_ref, r2row_ref, out_ref,
            *, law: str, wrap: bool, ti: int, tj: int, subtiles: int,
            use_rsqrt: bool):
    jo = pl.program_id(1)
    w = pf_ref[_PF_W]
    inv_w = pf_ref[_PF_INV_W]

    xi = pos_i_ref[:, 0:1]  # [TI, 1]
    yi = pos_i_ref[:, 1:2]
    zi = pos_i_ref[:, 2:3]
    u = u_ref[:]  # [TI, P]

    def body(s, acc):
        ax, ay, az = acc
        col = pl.ds(s * tj, tj)
        dx = pos_jt_ref[0:1, col] - xi  # [TI, TJ], i -> j
        dy = pos_jt_ref[1:2, col] - yi
        dz = pos_jt_ref[2:3, col] - zi
        if wrap:
            dx = dx - jnp.round(dx * inv_w) * w
            dy = dy - jnp.round(dy * inv_w) * w
            dz = dz - jnp.round(dz * inv_w) * w
        d2 = dx * dx + dy * dy + dz * dz
        # r2row: r^2 (clamped to 1 for particle-life) for real sources,
        # -1 for padding — one compare does radius gate + padding mask
        in_r = d2 < r2row_ref[0:1, col]
        coef = jnp.dot(u, vt_ref[:, col], preferred_element_type=jnp.float32)
        if law == "particle_life":
            # out-of-range/padded pairs park at d2=1 where the law is exactly
            # zero; near-zero d2 (self pairs) clamp to eps — the huge-but-
            # finite repulsion multiplies dx=0 and contributes nothing
            safe = jnp.where(in_r, jnp.maximum(d2, 1e-12), 1.0)
            sca = _scale(law, safe, coef, pf_ref, None, use_rsqrt)
        elif law == "gravity":
            # mask d2 == 0 (self pairs / coincident particles): with
            # softening > 0 they would contribute s*dx = 0 anyway, but with
            # softening == 0 rsqrt(0) = inf and inf*0 = NaN poisons the row
            valid = jnp.logical_and(d2 > 0.0, in_r)
            safe = jnp.where(valid, d2, 1.0)
            sca = _scale(law, safe, coef, pf_ref, valid, use_rsqrt)
        else:
            valid = jnp.logical_and(d2 > 0.0, in_r)
            safe = jnp.where(valid, d2, 1.0)
            sca = _scale(law, safe, coef, pf_ref, valid, use_rsqrt)
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
def _call(pos, u, src_pos, src_v, params_f, r2_gate, law, wrap, ti, tj,
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
    # radius gate + padding mask in one row (see module docstring)
    r2row = jnp.full((1, np_j), -1.0, jnp.float32)
    r2row = r2row.at[:, :n_src].set(r2_gate.astype(jnp.float32))

    grid = (np_i // ti, np_j // jblock)
    p = u_p.shape[1]

    out = pl.pallas_call(
        functools.partial(
            _kernel, law=law, wrap=wrap, ti=ti, tj=tj, subtiles=subtiles,
            use_rsqrt=not interpret,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params_f
            pl.BlockSpec((ti, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, jblock), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, p), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, jblock), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jblock), lambda i, j: (0, j), memory_space=pltpu.VMEM),
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
    )(params_f, pos_p, pos_jt, u_p, vt, r2row)
    return out[:n]


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def pack_params(cfg: SimConfig):
    """Scalar param vector consumed by the kernel (SMEM)."""
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    w = f32(cfg.world_size)
    m = f32(cfg.min_pull_ratio)
    eps = f32(cfg.lj_epsilon)
    sig = f32(cfg.lj_sigma)
    soft = f32(cfg.gravity_softening)
    return jnp.stack([
        w,
        1.0 / w,
        m,
        1.0 / m,
        1.0 / (1.0 - m),
        1.0 + m,
        24.0 * eps,
        sig * sig,
        f32(cfg.gravity_constant),
        soft * soft,
        f32(cfg.spring_stiffness),
        f32(cfg.spring_rest_length),
        2.0 / (1.0 - m),
        (1.0 + m) / (1.0 - m),
    ])


def _r2_gate(cfg: SimConfig):
    r = jnp.asarray(cfg.particle_effect_radius, jnp.float32)
    r2 = r * r
    if cfg.force_law == "particle_life":
        # force is identically zero at raw distance >= 1 (quirk Q2), so the
        # effective cutoff is min(radius, 1) — fewer pairs survive the gate
        # and the in-kernel d<1 test disappears.
        r2 = jnp.minimum(r2, 1.0)
    return r2


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

    Same-set sweeps route to the triangular shared-geometry kernel (1.8x on
    hardware) once N is large enough to fill its square tiles.
    """
    if src_positions is None:
        if positions.shape[0] >= 4 * 512 and ti is None and tj is None \
                and subtiles is None:
            return pallas_allpairs_forces_tri(
                positions, u, v, cfg, interpret=interpret)
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
        src_v = jnp.pad(src_v, ((0, 0), (0, PAIR_P - src_v.shape[1]))) \
            if src_v.shape[1] < PAIR_P else src_v
    params_f = pack_params(cfg)
    return _call(
        positions, u, src_positions, src_v, params_f, _r2_gate(cfg),
        cfg.force_law, bool(cfg.wrap_forces), ti, tj, subtiles, interpret,
    )


# ---------------------------------------------------------------------------
# Triangular (shared-geometry) all-pairs kernel
# ---------------------------------------------------------------------------
#
# The one-sided kernel computes the pair geometry (delta, wrap, d^2, gate,
# sqrt) twice per unordered pair — once for (i,j), once for (j,i). Forces are
# NOT symmetric here (the attraction matrix is asymmetric; gravity's
# acceleration carries m_j), but the expensive geometry IS: this kernel walks
# unordered tile pairs (i, j=(i+k) mod nt) on an (i, diagonal-k) grid,
# computes the geometry once, evaluates the two directional scales (two
# rank-1 coef matmuls), and accumulates both directions:
#
#   * i-side rows go to out_a[i]: k is the INNER grid axis, so the out_a
#     block is revisited CONSECUTIVELY — the one revisit pattern with
#     defined Pallas semantics (classic reduction grid).
#   * j-side columns go to a write-once partial buffer out_b[k, j]: every
#     (i, k) step owns block (k, (i+k) mod nt) exclusively, and the k-sum
#     reduction happens outside the kernel (one cheap XLA reduce).
#
# Round-1 lesson (caught by the bench equivalence assert): accumulating
# out_b[j] in place relies on output-block content surviving NON-consecutive
# revisits, which Pallas TPU does not define — it happened to compile
# correctly for small grids and silently mis-accumulated for nt >= ~60 at
# T=640 (N >= ~40k), deterministically per shape.
#
# Diagonal k=0 is evaluated one-sided (a full (i,i) tile already covers every
# ordered pair inside it); for even nt the k=nt/2 diagonal is computed only
# for i < nt/2 to avoid double coverage.


def _tri_kernel(pf_ref, *refs,
                law: str, wrap: bool, t: int, nt: int, use_rsqrt: bool,
                cull: bool = False):
    if cull:
        # bounding-sphere culling: tile pairs whose spheres cannot come
        # within the cutoff contribute EXACTLY zero (every implemented law
        # is gated at the radius), so the whole body is skipped. The mask
        # is bit-packed [nt, ceil(nk/32)] in SMEM; out_b blocks of skipped
        # steps are zeroed (they are write-once and summed outside).
        mask_ref = refs[0]
        refs = refs[1:]
    (pos_i_ref, pos_jt_ref, u_ref, v_ref, ut_ref, vt_ref,
     r2row_ref, imask_ref, out_a_ref, out_b_ref) = refs
    k = pl.program_id(1)
    w = pf_ref[0]
    i = pl.program_id(0)
    if cull:
        word = mask_ref[i, k // 32]
        run = ((word >> (k % 32)) & 1) != 0

        # k == 0 (the self diagonal) is never culled by construction, so
        # out_a is always initialized at k == 0
        @pl.when(jnp.logical_and(~run, k > 0))
        def _():
            out_b_ref[0] = jnp.zeros_like(out_b_ref[0])

        @pl.when(jnp.logical_or(run, k == 0))
        def _():
            _tri_body(pf_ref, pos_i_ref, pos_jt_ref, u_ref, v_ref, ut_ref,
                      vt_ref, r2row_ref, imask_ref, out_a_ref, out_b_ref,
                      i, k, law=law, wrap=wrap, t=t, nt=nt,
                      use_rsqrt=use_rsqrt)
    else:
        _tri_body(pf_ref, pos_i_ref, pos_jt_ref, u_ref, v_ref, ut_ref,
                  vt_ref, r2row_ref, imask_ref, out_a_ref, out_b_ref,
                  i, k, law=law, wrap=wrap, t=t, nt=nt, use_rsqrt=use_rsqrt)


def _tri_body(pf_ref, pos_i_ref, pos_jt_ref, u_ref, v_ref, ut_ref, vt_ref,
              r2row_ref, imask_ref, out_a_ref, out_b_ref, i, k,
              *, law: str, wrap: bool, t: int, nt: int, use_rsqrt: bool):
    w = pf_ref[0]

    # In wrap mode positions arrive PRE-SCALED by 1/w (and r2row by 1/w^2):
    # the minimum image is then dx' - round(dx') — 3 VPU passes per component
    # instead of 5 — and one d2 rescale returns to world units for the law.
    xi = pos_i_ref[:, 0:1]
    yi = pos_i_ref[:, 1:2]
    zi = pos_i_ref[:, 2:3]
    dx = pos_jt_ref[0:1, :] - xi  # [T, T]
    dy = pos_jt_ref[1:2, :] - yi
    dz = pos_jt_ref[2:3, :] - zi
    if wrap:
        dx = dx - jnp.round(dx)
        dy = dy - jnp.round(dy)
        dz = dz - jnp.round(dz)
    d2 = dx * dx + dy * dy + dz * dz
    in_r = d2 < r2row_ref[0:1, :]
    # Q8 self/coincidence gate. In wrap mode XLA may fuse the outside 1/w
    # pre-scale into an FMA inside the subtraction, leaving ~1-ulp nonzero
    # self-pair deltas — gate on the SCALED d2 with a threshold safely above
    # that noise (3*(2^-24)^2 ~ 1e-14) instead of relying on exact zeros.
    valid = jnp.logical_and(d2 > (1e-12 if wrap else 0.0), in_r)
    if wrap:
        d2 = d2 * (w * w)

    coef_ij = jnp.dot(u_ref[:], vt_ref[:], preferred_element_type=jnp.float32)
    coef_ji = jnp.dot(v_ref[:], ut_ref[:], preferred_element_type=jnp.float32)

    safe = jnp.where(valid, d2, 1.0)
    if law == "particle_life":
        inv_d, d = _inv_sqrt(safe, use_rsqrt)
        rep = pf_ref[_PF_INV_M] - inv_d
        tshape = jnp.maximum(
            1.0 - jnp.abs(d * pf_ref[_PF_T2] - pf_ref[_PF_TC]), 0.0
        ) * inv_d  # parked d=1 pairs land here, exactly 0
        is_rep = d < pf_ref[_PF_M]
        s_ij = jnp.where(is_rep, rep, coef_ij * tshape)
        s_ji = jnp.where(is_rep, rep, coef_ji * tshape)
    elif law == "gravity":
        dd2 = safe + pf_ref[_PF_G_S2]  # valid gate guards softening == 0
        inv, _ = _inv_sqrt(dd2, use_rsqrt)
        base = pf_ref[_PF_G] * (inv * inv * inv)
        s_ij = jnp.where(valid, coef_ij * base, 0.0)
        s_ji = jnp.where(valid, coef_ji * base, 0.0)
    else:  # lennard_jones / spring: symmetric pair coefficient
        base = _scale(law, safe, 1.0, pf_ref, valid, use_rsqrt)
        s_ij = coef_ij * base
        s_ji = coef_ji * base

    # mask padded receiver ROWS out of the j-side accumulation (padded
    # source columns are already killed by r2row)
    s_ji = s_ji * imask_ref[:, 0:1]

    acc_a = jnp.concatenate(
        [jnp.sum(dx * s_ij, axis=1, keepdims=True),
         jnp.sum(dy * s_ij, axis=1, keepdims=True),
         jnp.sum(dz * s_ij, axis=1, keepdims=True)], axis=1)  # [T, 3]

    half_pair = jnp.logical_and(2 * k == nt, i * 2 >= nt)
    scale_b = jnp.where(half_pair, 0.0, 1.0)
    if wrap:  # deltas are in scaled units; restore world units (cheap [T,3])
        scale_b = scale_b * w
    # j-side receives the negated deltas: acc_b = -sum_rows(d * s_ji);
    # the k=0 diagonal is covered one-sided by acc_a (zero its j-side).
    # Built TRANSPOSED [3, T]: the axis-0 row sums already have that shape,
    # and the [nk, 3, mp] partial layout pads its 3 only to 8 sublanes
    # (a [nk, mp, 3] layout would pad the minor 3 to 128 lanes — 16x memory).
    scale_bj = scale_b * jnp.where(k == 0, 0.0, 1.0)
    acc_bt = -jnp.concatenate(
        [jnp.sum(dx * s_ji, axis=0, keepdims=True),
         jnp.sum(dy * s_ji, axis=0, keepdims=True),
         jnp.sum(dz * s_ji, axis=0, keepdims=True)], axis=0) * scale_bj
    # the i-side of a skipped half-diagonal step must also not accumulate
    acc_a = acc_a * scale_b

    # out_a[i]: k is the inner grid axis -> consecutive revisits (defined
    # accumulation); out_b[k, :, j]: written exactly once per grid step
    @pl.when(k == 0)
    def _():
        out_a_ref[:] = acc_a

    @pl.when(k > 0)
    def _():
        out_a_ref[:] = out_a_ref[:] + acc_a

    out_b_ref[0] = acc_bt


@functools.partial(
    jax.jit, static_argnames=("law", "wrap", "t", "interpret"))
def _tri_call(pos, u, v, params_f, r2_gate, law, wrap, t, interpret,
              mask=None):
    n = pos.shape[0]
    np_ = _round_to(n, t)
    nt = np_ // t

    pos32 = pos.astype(jnp.float32)
    r2 = r2_gate.astype(jnp.float32)
    if wrap:  # pre-scale to box units: in-kernel wrap = dx - round(dx)
        inv_w = params_f[_PF_INV_W]
        pos32 = pos32 * inv_w
        r2 = r2 * (inv_w * inv_w)
    pos_p = _pad_rows(pos32, np_)
    u_p = _pad_rows(u.astype(jnp.float32), np_)
    v_p = _pad_rows(v.astype(jnp.float32), np_)
    pos_t = pos_p.T
    ut = u_p.T
    vt = v_p.T
    r2row = jnp.full((1, np_), -1.0, jnp.float32).at[:, :n].set(r2)
    imask = jnp.zeros((np_, 1), jnp.float32).at[:n].set(1.0)
    p = u_p.shape[1]

    def by_i(i, k):
        return (i, 0)

    def by_jt(i, k):
        return (0, (i + k) % nt)

    def by_kj(i, k):
        return (k, 0, (i + k) % nt)

    nk = nt // 2 + 1
    grid = (nt, nk)  # k inner: out_a revisits are consecutive (defined)
    cull = mask is not None
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    args = [params_f]
    if cull:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(mask)
    in_specs += [
        pl.BlockSpec((t, 3), by_i, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, t), by_jt, memory_space=pltpu.VMEM),
        pl.BlockSpec((t, p), by_i, memory_space=pltpu.VMEM),
        pl.BlockSpec((t, p), by_i, memory_space=pltpu.VMEM),
        pl.BlockSpec((p, t), by_jt, memory_space=pltpu.VMEM),
        pl.BlockSpec((p, t), by_jt, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t), by_jt, memory_space=pltpu.VMEM),
        pl.BlockSpec((t, 1), by_i, memory_space=pltpu.VMEM),
    ]
    args += [pos_p, pos_t, u_p, v_p, ut, vt, r2row, imask]
    out_a, out_b = pl.pallas_call(
        functools.partial(_tri_kernel, law=law, wrap=wrap, t=t, nt=nt,
                          use_rsqrt=not interpret, cull=cull),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((t, 3), by_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, t), by_kj, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((np_, 3), jnp.float32),
            jax.ShapeDtypeStruct((nk, 3, np_), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return (out_a + jnp.sum(out_b, axis=0).T)[:n]


def pallas_allpairs_forces_tri(positions, u, v, cfg: SimConfig, *,
                               t: int | None = None,
                               interpret: bool | None = None):
    """Triangular all-pairs forces [N,3] (same-set sweeps only).

    Default tile: 640 for particle-life (measured VMEM fit on v5e, 1.0e11
    pairs/s at N=262k), 512 for the other laws (more conservative)."""
    n = positions.shape[0]
    if interpret is None:
        interpret = _use_interpret()
    if t is None:
        t = 640 if cfg.force_law == "particle_life" else 512
    t = min(t, max(8, -(-n // 8) * 8))
    if u.shape[1] < PAIR_P:
        pad = PAIR_P - u.shape[1]
        u = jnp.pad(u, ((0, 0), (0, pad)))
        v = jnp.pad(v, ((0, 0), (0, pad)))
    return _tri_call(positions, u, v, pack_params(cfg), _r2_gate(cfg),
                     cfg.force_law, bool(cfg.wrap_forces), t, interpret)


# ---------------------------------------------------------------------------
# Culled triangular backend: Morton sort + bounding-sphere tile gating
# ---------------------------------------------------------------------------
#
# Every implemented force law is exactly zero beyond its radius gate, so a
# tile PAIR whose bounding spheres cannot come within the cutoff contributes
# exactly zero and can skip the entire 38-pass pair computation. With
# particles sorted along a Morton (Z-order) curve, tiles are spatially
# compact and most of the nt*(nt/2+1) tile pairs are culled: measured on the
# v5e at N=262k, T=640, the all-skip grid floor is 17 ms against the dense
# sweep's ~500 ms — cost scales with the SURVIVING pair fraction, i.e. with
# the actual interaction structure, not N^2, and with no capacity concept
# at all. This is the TPU-native answer to tree/Verlet methods for
# inhomogeneous densities (and the adaptive driver's fallback for scenes
# whose clusters exceed every feasible cell capacity).


def morton_keys(positions, world_size, bits: int = 10):
    """Z-order key per particle (3 x ``bits`` interleaved, i32)."""
    w = jnp.asarray(world_size, jnp.float32)
    scale = jnp.float32(1 << bits)
    q = jnp.clip(((positions + 0.5 * w) / w * scale).astype(jnp.int32),
                 0, (1 << bits) - 1)

    def spread(x):  # classic 10-bit 3-D bit spread
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def _pack_bits(mask_bool):
    """[nt, nk] bool -> [nt, ceil(nk/32)] i32 bit-pack (SMEM-friendly)."""
    nt, nk = mask_bool.shape
    nkw = -(-nk // 32)
    padded = jnp.pad(mask_bool.astype(jnp.uint32),
                     ((0, 0), (0, nkw * 32 - nk)))
    bits = padded.reshape(nt, nkw, 32) << jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits, axis=-1).astype(jnp.int32)


def culled_tile_mask(pos_sorted, n: int, t: int, cfg: SimConfig):
    """(packed mask [nt, nkw], surviving fraction) for Morton-sorted,
    zero-padded positions of ``_round_to(n, t)`` rows.

    Conservative by construction: per-tile bounds come from min-image
    deltas around each tile's first member (``tile_bounds`` — a frozen-
    order member that wrapped across the periodic seam folds back instead
    of blowing the box to world size; a tile genuinely spread past w/2 is
    marked uncullable), pair distance uses the minimum image of box
    centers, and the self diagonal always survives.
    """
    np_ = pos_sorted.shape[0]
    nt = np_ // t
    nk = nt // 2 + 1
    w = jnp.asarray(cfg.world_size, jnp.float32)
    cutoff = jnp.sqrt(_r2_gate(cfg)).astype(jnp.float32)

    centers, radii = tile_bounds(pos_sorted, n, t, cfg)

    i = jnp.arange(nt)[:, None]
    k = jnp.arange(nk)[None, :]
    j = (i + k) % nt
    d = centers[i] - centers[j.reshape(-1)].reshape(nt, nk, 3)
    if cfg.wrap_forces:
        d = d - jnp.round(d / w) * w
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
    run = dist <= radii[i] + radii[j.reshape(-1)].reshape(nt, nk) + cutoff
    run = run.at[:, 0].set(True)  # self diagonal: never culled
    frac = jnp.mean(run.astype(jnp.float32))
    return _pack_bits(run), frac


def _culled_tile_size(n: int, cfg: SimConfig, t: int | None) -> int:
    if t is None:
        t = 640 if cfg.force_law == "particle_life" else 512
    return min(t, max(8, -(-n // 8) * 8))


def culled_forces_sorted(pos_s, u_s, v_s, cfg: SimConfig, *,
                         t: int | None = None,
                         interpret: bool | None = None):
    """(forces [N,3], surviving fraction) for ALREADY Morton-sorted inputs.
    The tile mask is recomputed from the given positions, so a frozen sort
    order stays EXACT as particles drift (tile bounding boxes simply grow).
    ``engine.step.simulate_culled`` builds on the same frozen-order
    contract but walks a scalar-prefetched worklist of the surviving pairs
    (``pallas_allpairs_forces_pairlist``) instead of this dense grid."""
    n = pos_s.shape[0]
    if interpret is None:
        interpret = _use_interpret()
    t = _culled_tile_size(n, cfg, t)
    if u_s.shape[1] < PAIR_P:
        pad = PAIR_P - u_s.shape[1]
        u_s = jnp.pad(u_s, ((0, 0), (0, pad)))
        v_s = jnp.pad(v_s, ((0, 0), (0, pad)))
    np_ = _round_to(n, t)
    mask, frac = culled_tile_mask(_pad_rows(pos_s.astype(jnp.float32), np_),
                                  n, t, cfg)
    f = _tri_call(pos_s, u_s, v_s, pack_params(cfg), _r2_gate(cfg),
                  cfg.force_law, bool(cfg.wrap_forces), t, interpret,
                  mask=mask)
    return f, frac


def pallas_allpairs_forces_culled(positions, u, v, cfg: SimConfig, *,
                                  t: int | None = None,
                                  interpret: bool | None = None,
                                  with_stats: bool = False):
    """Exact forces [N,3] via the Morton-sorted, bounding-sphere-culled
    triangular kernel. Cost tracks the surviving tile-pair fraction; no
    cell capacities, no density assumptions — the robust exact backend for
    clustered/inhomogeneous scenes."""
    order = jnp.argsort(morton_keys(positions, cfg.world_size))
    f_sorted, frac = culled_forces_sorted(
        positions[order], u[order], v[order], cfg, t=t, interpret=interpret)
    out = jnp.zeros_like(f_sorted).at[order].set(f_sorted)
    if with_stats:
        return out, frac
    return out


# ---------------------------------------------------------------------------
# Worklist-driven triangular kernel (scalar-prefetched tile-pair list)
# ---------------------------------------------------------------------------
#
# The bit-mask culled kernel above still walks the FULL nt x (nt/2+1) grid
# and pays a fixed per-step cost for every skipped pair (~17 ms at N=262k,
# T=640 on a v5e) — a floor that grows O(nt^2) with N and dominates exactly
# where culling works best (clustered scenes, small surviving fractions).
# This variant instead enumerates only the SURVIVING unordered tile pairs in
# a scalar-prefetched worklist: grid = (W,), and the (i, j) of step s come
# from a packed SMEM array driving the BlockSpec index maps — cost is
# O(survivors), with no floor and no dense partial buffer:
#
#   * entries are packed (i << 15) | j (one i32 per pair: SMEM holds ~250k
#     entries within the 1 MB scoped budget; two separate arrays would not).
#   * the list is sorted by i (row-major upper-triangular order), so out_a's
#     revisits are CONSECUTIVE — the defined Pallas accumulation pattern —
#     and "first visit" is just wi[s] != wi[s-1].
#   * the j-side partials are write-once per grid step into out_b[s] (one
#     [3, T] slot per worklist entry, O(W) not O(nt * N) memory); the j-sum
#     happens outside with one scatter-add keyed by the j fields.
#   * every tile's self pair (i, i) always survives, so every out_a block is
#     initialized; self pairs are covered one-sided (j-side zeroed), exactly
#     like the k=0 diagonal of the dense-grid kernel.
#   * padding entries point at a fully-masked dummy source tile appended at
#     j = nt (r2row = -1 kills every pair) with i = nt-1, which merges into
#     the final real run — zero contribution, defined accumulation.
#
# Worklists longer than the SMEM bound run as chunks over contiguous i
# ranges (pallas_allpairs_forces_pairlist handles the splitting; each
# chunk's out_a rows outside its own range are zeroed before the sum, so
# boundary tiles split across chunks accumulate correctly).

_PACK_SHIFT = 15  # j field width: nt + 1 (dummy tile) must fit in 15 bits
_WLIST_MAX = 196608  # packed entries per pallas_call (768 KB of 1 MB SMEM)


def _pairlist_kernel(wp_ref, pf_ref, pos_i_ref, pos_jt_ref, u_ref, v_ref,
                     ut_ref, vt_ref, r2row_ref, imask_ref, out_a_ref,
                     out_b_ref, *, law: str, wrap: bool, t: int,
                     use_rsqrt: bool):
    s = pl.program_id(0)
    packed = wp_ref[s]
    i = packed >> _PACK_SHIFT
    j = packed & ((1 << _PACK_SHIFT) - 1)
    first = jnp.logical_or(
        s == 0, (wp_ref[jnp.maximum(s - 1, 0)] >> _PACK_SHIFT) != i)
    w = pf_ref[0]

    # geometry + two directional scales: same math as _tri_body (positions
    # pre-scaled by 1/w in wrap mode, r2row by 1/w^2)
    xi = pos_i_ref[:, 0:1]
    yi = pos_i_ref[:, 1:2]
    zi = pos_i_ref[:, 2:3]
    dx = pos_jt_ref[0:1, :] - xi  # [T, T]
    dy = pos_jt_ref[1:2, :] - yi
    dz = pos_jt_ref[2:3, :] - zi
    if wrap:
        dx = dx - jnp.round(dx)
        dy = dy - jnp.round(dy)
        dz = dz - jnp.round(dz)
    d2 = dx * dx + dy * dy + dz * dz
    in_r = d2 < r2row_ref[0:1, :]
    valid = jnp.logical_and(d2 > (1e-12 if wrap else 0.0), in_r)
    if wrap:
        d2 = d2 * (w * w)

    coef_ij = jnp.dot(u_ref[:], vt_ref[:], preferred_element_type=jnp.float32)
    coef_ji = jnp.dot(v_ref[:], ut_ref[:], preferred_element_type=jnp.float32)

    safe = jnp.where(valid, d2, 1.0)
    if law == "particle_life":
        inv_d, d = _inv_sqrt(safe, use_rsqrt)
        rep = pf_ref[_PF_INV_M] - inv_d
        tshape = jnp.maximum(
            1.0 - jnp.abs(d * pf_ref[_PF_T2] - pf_ref[_PF_TC]), 0.0
        ) * inv_d
        is_rep = d < pf_ref[_PF_M]
        s_ij = jnp.where(is_rep, rep, coef_ij * tshape)
        s_ji = jnp.where(is_rep, rep, coef_ji * tshape)
    elif law == "gravity":
        dd2 = safe + pf_ref[_PF_G_S2]
        inv, _ = _inv_sqrt(dd2, use_rsqrt)
        base = pf_ref[_PF_G] * (inv * inv * inv)
        s_ij = jnp.where(valid, coef_ij * base, 0.0)
        s_ji = jnp.where(valid, coef_ji * base, 0.0)
    else:
        base = _scale(law, safe, 1.0, pf_ref, valid, use_rsqrt)
        s_ij = coef_ij * base
        s_ji = coef_ji * base

    s_ji = s_ji * imask_ref[:, 0:1]  # padded receiver rows: no j-side share

    scale_a = w if wrap else 1.0
    acc_a = jnp.concatenate(
        [jnp.sum(dx * s_ij, axis=1, keepdims=True),
         jnp.sum(dy * s_ij, axis=1, keepdims=True),
         jnp.sum(dz * s_ij, axis=1, keepdims=True)], axis=1) * scale_a

    # self pairs (j == i) are covered one-sided by acc_a's full square
    scale_bj = jnp.where(j == i, 0.0, 1.0) * scale_a
    acc_bt = -jnp.concatenate(
        [jnp.sum(dx * s_ji, axis=0, keepdims=True),
         jnp.sum(dy * s_ji, axis=0, keepdims=True),
         jnp.sum(dz * s_ji, axis=0, keepdims=True)], axis=0) * scale_bj

    @pl.when(first)
    def _():
        out_a_ref[:] = acc_a

    @pl.when(~first)
    def _():
        out_a_ref[:] = out_a_ref[:] + acc_a

    out_b_ref[0] = acc_bt


@functools.partial(
    jax.jit, static_argnames=("law", "wrap", "t", "nt", "interpret"))
def _pairlist_call(wp, pos_p, pos_tx, u_p, v_p, utx, vtx, r2rowx, imask,
                   params_f, law, wrap, t, nt, interpret):
    """One pallas_call over a (chunk of a) packed worklist. The source-side
    arrays carry the dummy masked tile at index nt. Returns (out_a [np_,3],
    out_b [W,3,t])."""
    wcap = wp.shape[0]
    np_ = pos_p.shape[0]
    p = u_p.shape[1]
    mask_j = (1 << _PACK_SHIFT) - 1

    def by_i(s, wp_ref):
        return (wp_ref[s] >> _PACK_SHIFT, 0)

    def by_jt(s, wp_ref):
        return (0, wp_ref[s] & mask_j)

    def by_s(s, wp_ref):
        return (s, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(wcap,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params_f
            pl.BlockSpec((t, 3), by_i),
            pl.BlockSpec((3, t), by_jt),
            pl.BlockSpec((t, p), by_i),
            pl.BlockSpec((t, p), by_i),
            pl.BlockSpec((p, t), by_jt),
            pl.BlockSpec((p, t), by_jt),
            pl.BlockSpec((1, t), by_jt),
            pl.BlockSpec((t, 1), by_i),
        ],
        out_specs=(
            pl.BlockSpec((t, 3), by_i),
            pl.BlockSpec((1, 3, t), by_s),
        ),
    )
    return pl.pallas_call(
        functools.partial(_pairlist_kernel, law=law, wrap=wrap, t=t,
                          use_rsqrt=not interpret),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((np_, 3), jnp.float32),
            jax.ShapeDtypeStruct((wcap, 3, t), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(wp, params_f, pos_p, pos_tx, u_p, v_p, utx, vtx, r2rowx, imask)


def tile_bounds(pos_sorted, n: int, t: int, cfg: SimConfig | None = None):
    """(centers [nt,3], radii [nt]) bounding spheres per tile of Morton-
    sorted, zero-padded positions.

    With a periodic config the box is computed in MIN-IMAGE deltas around
    each tile's first (always-real) member: a particle that wrapped across
    the seam mid-window would otherwise blow the raw-coordinate box up to
    world size and make its tile survive against everyone — measured on the
    262k preset, seam wraps inflated the surviving-pair count ~3x within an
    8-step frozen-sort window. The fold is a true bound while the folded
    spread stays under w/2 per axis; a tile spread wider than that (a
    catastrophically stale sort) is marked uncullable (radius 1e30) —
    conservative, never wrong."""
    np_ = pos_sorted.shape[0]
    nt = np_ // t
    valid = (jnp.arange(np_) < n).reshape(nt, t, 1)
    p3 = pos_sorted.astype(jnp.float32).reshape(nt, t, 3)
    wrap = cfg is not None and bool(cfg.wrap_forces)
    anchor = p3[:, 0:1, :]  # tile row 0: always a real particle
    d = p3 - anchor
    if wrap:
        w = jnp.asarray(cfg.world_size, jnp.float32)
        d = d - jnp.round(d / w) * w
    d = jnp.where(valid, d, 0.0)  # padding rows sit on the anchor
    mins = jnp.min(d, axis=1)
    maxs = jnp.max(d, axis=1)
    centers = anchor[:, 0, :] + 0.5 * (mins + maxs)
    radii = 0.5 * jnp.sqrt(jnp.sum((maxs - mins) ** 2, axis=-1))
    if wrap:
        bad = jnp.any(maxs - mins >= 0.5 * w, axis=-1)
        radii = jnp.where(bad, jnp.float32(1e30), radii)
    return centers, radii


@functools.partial(jax.jit, static_argnames=("n", "t", "nt"))
def pair_survival_mask(pos_s_padded, n: int, t: int, nt: int,
                       cfg: SimConfig, skin=0.0):
    """Upper-triangular (j >= i) bool [nt, nt]: tile pairs whose bounding
    spheres can come within cutoff + skin. ``skin`` is the Verlet-style
    drift allowance: a worklist built from this mask stays EXACT while
    every particle has moved less than skin/2 since the mask was built
    (the in-kernel gate stays at the true cutoff, so included-but-distant
    pairs contribute exactly zero)."""
    w = jnp.asarray(cfg.world_size, jnp.float32)
    cutoff = jnp.sqrt(_r2_gate(cfg)).astype(jnp.float32) + skin
    centers, radii = tile_bounds(pos_s_padded, n, t, cfg)
    d = centers[:, None, :] - centers[None, :, :]
    if cfg.wrap_forces:
        d = d - jnp.round(d / w) * w
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
    run = dist <= radii[:, None] + radii[None, :] + cutoff
    iu = jnp.arange(nt)
    run = jnp.logical_and(run, iu[None, :] >= iu[:, None])  # j >= i
    run = jnp.logical_or(run, jnp.eye(nt, dtype=bool))      # self: always
    return run


def build_pair_worklist(mask_np, nt: int, quantum: int = 4096):
    """Packed worklist chunks from a host [nt, nt] survival mask.

    Returns ``(chunks, count)`` where chunks is a tuple of
    ``(wp i32[Wc], row_lo, row_hi)`` — each chunk covers a contiguous,
    sorted-by-i slice of the surviving (i, j >= i) pairs, padded to a
    ``quantum`` multiple (bounds recompiles) with inert (nt-1, dummy)
    entries. Host-side by design: the worklist feeds static kernel shapes,
    so the count -> shape decision is a host decision anyway.
    """
    import numpy as np

    assert nt + 1 < (1 << _PACK_SHIFT), f"nt={nt} overflows the pack field"
    ii, jj = np.nonzero(mask_np)  # row-major: sorted by i then j
    count = int(ii.shape[0])
    assert count >= nt, "self pairs must survive — every row appears"
    packed = ((ii.astype(np.int64) << _PACK_SHIFT)
              | jj.astype(np.int64)).astype(np.int32)
    chunks = []
    pos = 0
    while pos < count:
        wc = min(_WLIST_MAX, count - pos)
        if count > pos + wc:  # split at an i boundary: keep runs intact
            cut_i = int(ii[pos + wc - 1])
            # end the chunk before the first entry of cut_i's run unless the
            # whole chunk is one giant run (then split mid-run: the next
            # chunk re-initializes that row, rows are summed outside)
            run_start = int(np.searchsorted(ii, cut_i, side="left"))
            if run_start > pos:
                wc = run_start - pos
        wp = packed[pos:pos + wc]
        row_lo = int(ii[pos])
        row_hi = int(ii[pos + wc - 1])
        pad = (-len(wp)) % quantum
        if pad:
            # inert entries continuing the chunk's LAST row (i = row_hi,
            # j = the dummy masked tile): same-row -> defined accumulation
            # of zeros, and the chunk's row range stays tight
            pad_entry = np.int32((row_hi << _PACK_SHIFT) | nt)
            wp = np.concatenate([wp, np.full((pad,), pad_entry, np.int32)])
        chunks.append((wp, row_lo, row_hi))
        pos += wc
    return tuple(chunks), count


def pallas_allpairs_forces_pairlist(pos_s, u_s, v_s, cfg: SimConfig,
                                    chunks, *, t: int,
                                    interpret: bool | None = None):
    """Exact forces [N,3] for Morton-SORTED inputs from a frozen packed
    worklist (``build_pair_worklist``). O(survivors) cost — no dense-grid
    floor; the TPU-native replacement for the reference's per-particle
    neighbor loop (src/lib.rs:176-243) in the clustered/fallback regime.

    ``chunks``: tuple of (wp array, row_lo, row_hi); multi-chunk lists run
    one pallas_call per chunk (rows outside a chunk's range are zeroed
    before summation, so split rows accumulate correctly).
    """
    n = pos_s.shape[0]
    if interpret is None:
        interpret = _use_interpret()
    if u_s.shape[1] < PAIR_P:
        pad = PAIR_P - u_s.shape[1]
        u_s = jnp.pad(u_s, ((0, 0), (0, pad)))
        v_s = jnp.pad(v_s, ((0, 0), (0, pad)))
    np_ = _round_to(n, t)
    nt = np_ // t
    wrap = bool(cfg.wrap_forces)
    params_f = pack_params(cfg)

    pos32 = pos_s.astype(jnp.float32)
    r2 = _r2_gate(cfg).astype(jnp.float32) * jnp.ones((), jnp.float32)
    if wrap:
        inv_w = params_f[_PF_INV_W]
        pos32 = pos32 * inv_w
        r2 = r2 * (inv_w * inv_w)
    pos_p = _pad_rows(pos32, np_)
    u_p = _pad_rows(u_s.astype(jnp.float32), np_)
    v_p = _pad_rows(v_s.astype(jnp.float32), np_)
    r2row = jnp.full((1, np_), -1.0, jnp.float32).at[:, :n].set(r2)
    imask = jnp.zeros((np_, 1), jnp.float32).at[:n].set(1.0)
    # dummy fully-masked source tile at j = nt
    zt3 = jnp.zeros((3, t), jnp.float32)
    ztp = jnp.zeros((u_p.shape[1], t), jnp.float32)
    pos_tx = jnp.concatenate([pos_p.T, zt3], axis=1)
    utx = jnp.concatenate([u_p.T, ztp], axis=1)
    vtx = jnp.concatenate([v_p.T, ztp], axis=1)
    r2rowx = jnp.concatenate(
        [r2row, jnp.full((1, t), -1.0, jnp.float32)], axis=1)

    out_a_total = jnp.zeros((np_, 3), jnp.float32)
    fb = jnp.zeros((nt + 1, 3, t), jnp.float32)
    for wp, row_lo, row_hi in chunks:
        wp = jnp.asarray(wp)
        out_a, out_b = _pairlist_call(
            wp, pos_p, pos_tx, u_p, v_p, utx, vtx, r2rowx, imask, params_f,
            cfg.force_law, wrap, t, nt, interpret)
        if len(chunks) > 1:  # rows outside this chunk's range are garbage
            ra = jnp.zeros((np_, 3), jnp.float32)
            lo, hi = row_lo * t, (row_hi + 1) * t
            out_a = ra.at[lo:hi].set(out_a[lo:hi])
        out_a_total = out_a_total + out_a if len(chunks) > 1 else out_a
        wj = wp & ((1 << _PACK_SHIFT) - 1)
        fb = fb.at[wj].add(out_b)
    f = out_a_total + jnp.transpose(fb[:nt], (0, 2, 1)).reshape(np_, 3)
    return f[:n]
