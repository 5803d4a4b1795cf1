"""Ghost-augmented triangular all-pairs kernel with MXU force accumulation.

STATUS: experimental — correct on every backend, but MEASURED SLOWER than
the triangular VPU kernel on a v5e (see docs/PERF.md "MXU formulation:
measured and rejected"). Mosaic pads the narrow matmul dims ([T,T]x[T,4]
accumulation, [T,4]x[4,T] Gram) to 128 lanes, and the |p|-scale cancellation
in both factorizations forces HIGHEST-precision (6-pass) matmuls — together
that costs more than the ~24 VPU passes it removes. Kept as the measured
reference point for the d^2/S@P design (ROADMAP round-1 item 2) and for the
ghost-image machinery, which is independent of the MXU question.

The round-1 triangular kernel (``pallas_allpairs.py``) is VPU op-slot bound:
per unordered tile pair it spends ~12 VPU passes on the minimum-image wrap
and ~12 more on the ``dx*s`` accumulation + lane reductions. This kernel
removes both bottlenecks with two TPU-first moves (replacing the same
reference hot loop, ``src/lib.rs:176-243``):

  * **Periodic wrap via ghost images instead of per-pair wrap math.** Before
    the sweep, every particle within the cutoff shell of a box face gets a
    ghost copy shifted by the matching world offset (<= 26 images; ~15% extra
    sources for the 262k bench geometry). The padded set [reals | ghosts] is
    swept triangularly with PLAIN (unwrapped) deltas: each cross-boundary
    ordered interaction (i <- j image) appears exactly once as the pair
    {real i, ghost(j)} (see the coverage proof in ``_build_ghosts``), ghosts'
    own accumulated forces are discarded. 12 VPU passes -> 3.

  * **Force accumulation on the MXU.** With unwrapped deltas the force sum
    factorizes: F_i = sum_j s_ij (p_j - p_i) = (S @ [P|1])[:, :3] -
    p_i * (S @ [P|1])[:, 3:4] — one [T,T]x[T,4] matmul per direction instead
    of three elementwise multiplies + three lane reductions. The factored
    form re-associates the sum (|p|-magnitude intermediates), costing ~1e-5
    relative force accuracy vs the direct kernel.

``precision="fast"`` additionally computes the pair distances on the MXU:
d^2 = |p_i|^2 + |p_j|^2 - 2 p_i.p_j (one Gram matmul, ~3 VPU passes instead
of 8). The cancellation costs ~1e-3 relative accuracy on near-contact pairs
— opt-in.

Self pairs and coincident particles follow quirk Q8 (``src/lib.rs:216``):
zero force (gated by d^2 > 0 plus an index-diagonal mask, which "fast" needs
because its d^2 carries cancellation noise around zero).
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from .pallas_allpairs import (
    PAIR_P, _scale, _inv_sqrt, pack_params, _r2_gate,
    _use_interpret, _pad_rows, _round_to, _PF_INV_M, _PF_T2, _PF_TC, _PF_M,
    _PF_G_S2, _PF_G,
)

# the 26 non-zero image offsets in {-1,0,1}^3
_OFFSETS26 = np.array(
    [o for o in itertools.product((-1, 0, 1), repeat=3) if any(o)],
    dtype=np.float32,
)


def _mxu_kernel(pf_ref, p4_i_ref, p4_j_ref, p4_jt_ref, u_ref, v_ref, ut_ref,
                vt_ref, r2row_ref, imask_ref, out_a_ref, out_b_ref,
                *, law: str, fast: bool, t: int, nt: int, use_rsqrt: bool):
    k = pl.program_id(1)

    p4_i = p4_i_ref[:]   # [T, 4] = (x, y, z, 1)
    p4_j = p4_j_ref[:]   # [T, 4]
    r2row = r2row_ref[0:1, :]

    if fast:
        # d^2 = |pi|^2 + |pj|^2 - 2 pi.pj on the MXU. The ones column makes
        # G4 = pi.pj + 1, folded into the constant below. HIGHEST precision
        # is required: the |p|^2-scale cancellation amplifies the default
        # bf16 operand rounding to O(1) errors in d^2 (measured on v5e).
        g4 = jnp.dot(p4_i, p4_jt_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # [T, T]
        ni = (p4_i[:, 0:1] * p4_i[:, 0:1] + p4_i[:, 1:2] * p4_i[:, 1:2]
              + p4_i[:, 2:3] * p4_i[:, 2:3])              # [T, 1]
        nj = (p4_jt_ref[0:1, :] * p4_jt_ref[0:1, :]
              + p4_jt_ref[1:2, :] * p4_jt_ref[1:2, :]
              + p4_jt_ref[2:3, :] * p4_jt_ref[2:3, :])    # [1, T]
        d2 = jnp.maximum(ni + nj + (2.0 - 2.0 * g4), 0.0)
    else:
        dx = p4_jt_ref[0:1, :] - p4_i[:, 0:1]
        dy = p4_jt_ref[1:2, :] - p4_i[:, 1:2]
        dz = p4_jt_ref[2:3, :] - p4_i[:, 2:3]
        d2 = dx * dx + dy * dy + dz * dz

    # radius gate + padded-source-column mask + Q8 self/coincident gate; on
    # the k=0 diagonal also mask the index diagonal ("fast" d^2 is only
    # accurate to ~1e-4 near zero, so d2 > 0 alone cannot identify it)
    valid = jnp.logical_and(d2 > 0.0, d2 < r2row)
    row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    valid = jnp.logical_and(valid, jnp.logical_or(k > 0, row != col))

    coef_ij = jnp.dot(u_ref[:], vt_ref[:], preferred_element_type=jnp.float32)
    coef_ji = jnp.dot(v_ref[:], ut_ref[:], preferred_element_type=jnp.float32)

    safe = jnp.where(valid, d2, 1.0)
    if law == "particle_life":
        inv_d, d = _inv_sqrt(safe, use_rsqrt)
        rep = pf_ref[_PF_INV_M] - inv_d
        tshape = jnp.maximum(
            1.0 - jnp.abs(d * pf_ref[_PF_T2] - pf_ref[_PF_TC]), 0.0
        ) * inv_d
        is_rep = d < pf_ref[_PF_M]  # parked d=1 lands in tshape == 0
        s_ij = jnp.where(is_rep, rep, coef_ij * tshape)
        s_ji = jnp.where(is_rep, rep, coef_ji * tshape)
    elif law == "gravity":
        dd2 = safe + pf_ref[_PF_G_S2]
        inv, _ = _inv_sqrt(dd2, use_rsqrt)
        base = jnp.where(valid, pf_ref[_PF_G] * (inv * inv * inv), 0.0)
        s_ij = coef_ij * base
        s_ji = coef_ji * base
    else:  # lennard_jones / spring
        base = _scale(law, safe, 1.0, pf_ref, valid, use_rsqrt)
        s_ij = coef_ij * base
        s_ji = coef_ji * base

    # padded receiver rows are killed on the j-side (they are sources there);
    # as i-side sources the padded COLUMNS are killed by r2row = -1
    s_ji = s_ji * imask_ref[:, 0:1]

    half_pair = jnp.logical_and(2 * k == nt, pl.program_id(0) * 2 >= nt)
    scale_b = jnp.where(half_pair, 0.0, 1.0)

    # F_i = sum_j s_ij (p_j - p_i): one [T,T]x[T,4] matmul + a rank-1 fixup.
    # HIGHEST precision: the factored form subtracts two |p|-magnitude sums,
    # so bf16 operand rounding in the matmul would dominate the force.
    acc_a4 = jnp.dot(s_ij, p4_j, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # [T,4]
    acc_a = (acc_a4[:, 0:3] - p4_i[:, 0:3] * acc_a4[:, 3:4]) * scale_b
    # F_j = sum_i s_ji (p_i - p_j): contract the i (row) axis. Produced
    # TRANSPOSED [4, T] (operands swapped) so the write-once partial can use
    # the sublane-padded [nk, 3, mp] layout (see pallas_allpairs._tri_kernel).
    acc_b4t = jax.lax.dot_general(
        p4_i, s_ji, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [4, T]
    # k=0 diagonal is covered one-sided by acc_a
    scale_bj = scale_b * jnp.where(k == 0, 0.0, 1.0)
    acc_bt = (acc_b4t[0:3, :]
              - p4_jt_ref[0:3, :] * acc_b4t[3:4, :]) * scale_bj

    # out_a[i]: k inner -> consecutive revisits (defined accumulation);
    # out_b[k, j]: written once per grid step, k-reduced outside (see the
    # non-consecutive-revisit lesson in pallas_allpairs.py)
    @pl.when(k == 0)
    def _():
        out_a_ref[:] = acc_a

    @pl.when(k > 0)
    def _():
        out_a_ref[:] = out_a_ref[:] + acc_a

    out_b_ref[0] = acc_bt


@functools.partial(
    jax.jit, static_argnames=("law", "fast", "t", "interpret"))
def _mxu_call(p4, u, v, imask, r2row_vals, params_f, law, fast, t, interpret):
    m = p4.shape[0]
    mp = _round_to(m, t)
    nt = mp // t

    p4_p = _pad_rows(p4.astype(jnp.float32), mp)
    u_p = _pad_rows(u.astype(jnp.float32), mp)
    v_p = _pad_rows(v.astype(jnp.float32), mp)
    p4_t = p4_p.T
    ut = u_p.T
    vt = v_p.T
    r2row = jnp.full((1, mp), -1.0, jnp.float32).at[:, :m].set(
        r2row_vals.astype(jnp.float32))
    imask_col = jnp.zeros((mp, 1), jnp.float32).at[:m, 0].set(
        imask.astype(jnp.float32))
    p = u_p.shape[1]

    def by_i(i, k):
        return (i, 0)

    def by_j(i, k):
        return ((i + k) % nt, 0)

    def by_jt(i, k):
        return (0, (i + k) % nt)

    def by_kj(i, k):
        return (k, 0, (i + k) % nt)

    nk = nt // 2 + 1
    grid = (nt, nk)  # k inner: out_a revisits are consecutive (defined)
    out_a, out_b = pl.pallas_call(
        functools.partial(_mxu_kernel, law=law, fast=fast, t=t, nt=nt,
                          use_rsqrt=not interpret),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((t, 4), by_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 4), by_j, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, t), by_jt, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, p), by_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, p), by_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((p, t), by_jt, memory_space=pltpu.VMEM),
            pl.BlockSpec((p, t), by_jt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), by_jt, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), by_i, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((t, 3), by_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, t), by_kj, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, 3), jnp.float32),
            jax.ShapeDtypeStruct((nk, 3, mp), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(params_f, p4_p, p4_p, p4_t, u_p, v_p, ut, vt, r2row, imask_col)
    return (out_a + jnp.sum(out_b, axis=0).T)[:m]


# ---------------------------------------------------------------------------
# Ghost images
# ---------------------------------------------------------------------------
#
# Coverage proof sketch (full argument in the module docstring): for an
# in-range image interaction |(x_i - x_j) + k*w| <= r_eff with k != 0, the
# per-axis bounds force x_j within r_eff of the faces selected by -k and x_i
# within r_eff of the faces selected by k, so ghost(j, k) and ghost(i, -k)
# both exist. The triangular sweep then covers force-on-i once via
# {real i, ghost(j,k)} and force-on-j once via {real j, ghost(i,-k)}; the
# ghost-row accumulations of those pairs (and of ghost-ghost pairs, which
# duplicate image interactions already counted) are discarded. Direct
# (unwrapped) in-range pairs are covered by {real i, real j}; with
# world >= 2*cutoff a pair is never in range both directly and through an
# image (reference assert, src/lib.rs:132).


def _ghost_shell_mask(positions, w, r_eff):
    """[N, 26] bool: ghost copy pos + off*w lies within r_eff of the box."""
    offs = jnp.asarray(_OFFSETS26)  # [26, 3]
    lo = positions < (-0.5 * w + r_eff)  # near low face -> ghost at +w
    hi = positions > (0.5 * w - r_eff)   # near high face -> ghost at -w
    ok = jnp.where(
        offs[None, :, :] == 0.0,
        True,
        jnp.where(offs[None, :, :] > 0.0, lo[:, None, :], hi[:, None, :]),
    )
    return jnp.all(ok, axis=-1)


def _build_ghosts(positions, u, v, cfg: SimConfig, gcap: int):
    """Ghost arrays (positions/u/v gathered from parents, validity mask)."""
    n = positions.shape[0]
    w = jnp.asarray(cfg.world_size, positions.dtype)
    r2 = _r2_gate(cfg)
    r_eff = jnp.sqrt(r2)
    mask = _ghost_shell_mask(positions, w, r_eff)  # [N, 26]
    idx = jnp.nonzero(mask.ravel(), size=gcap, fill_value=n * 26)[0]
    valid = idx < n * 26
    p = jnp.where(valid, idx // 26, 0)
    o = jnp.where(valid, idx % 26, 0)
    gpos = positions[p] + jnp.asarray(_OFFSETS26, positions.dtype)[o] * w
    return gpos, u[p], v[p], valid


def ghost_count(positions, cfg: SimConfig):
    """Number of ghost images the current frame needs (validate against
    cfg.ghost_capacity; under-capacity silently drops wrap interactions)."""
    w = jnp.asarray(cfg.world_size, positions.dtype)
    r_eff = jnp.sqrt(_r2_gate(cfg))
    return jnp.sum(_ghost_shell_mask(positions, w, r_eff).astype(jnp.int32))


def recommended_ghost_capacity(cfg: SimConfig, n: int, slack: float = 1.6) -> int:
    """Static ghost capacity for a uniform density scene: expected shell
    population x slack, lane-rounded. Needs a concrete (untraced) config."""
    w = float(np.asarray(cfg.world_size))
    r = float(np.asarray(cfg.particle_effect_radius))
    r_eff = min(r, 1.0) if cfg.force_law == "particle_life" else r
    rho = min(r_eff / w, 0.5)
    expected = n * ((1.0 + 2.0 * rho) ** 3 - 1.0)
    return int(_round_to(int(expected * slack) + 256, 128))


def pallas_allpairs_forces_mxu(positions, u, v, cfg: SimConfig, *,
                               precision: str | None = None,
                               t: int | None = None,
                               gcap: int | None = None,
                               interpret: bool | None = None):
    """Accumulated pair forces [N,3] via the ghost+MXU triangular kernel.

    precision: "exact" (default; unwrapped f32 geometry, ~1e-5 relative from
    the factored MXU accumulation) or "fast" (d^2 on the MXU too, ~1e-3
    relative on near-contact pairs). Same-set sweeps only.
    """
    n = positions.shape[0]
    if precision is None:
        precision = getattr(cfg, "precision", "exact") or "exact"
    if precision not in ("exact", "fast"):
        raise ValueError(f"precision must be 'exact' or 'fast', got {precision!r}")
    if interpret is None:
        interpret = _use_interpret()
    if u.shape[1] < PAIR_P:
        pad = PAIR_P - u.shape[1]
        u = jnp.pad(u, ((0, 0), (0, pad)))
        v = jnp.pad(v, ((0, 0), (0, pad)))

    r2 = _r2_gate(cfg)
    if cfg.wrap_forces:
        if gcap is None:
            gcap = cfg.ghost_capacity
        if gcap is None:
            try:
                gcap = recommended_ghost_capacity(cfg, n)
            except (TypeError, jax.errors.TracerArrayConversionError):
                raise ValueError(
                    "allpairs_mxu with periodic forces needs a static ghost "
                    "capacity: set cfg.ghost_capacity (see "
                    "recommended_ghost_capacity) when config values are "
                    "traced")
        gpos, gu, gv, gvalid = _build_ghosts(positions, u, v, cfg, gcap)
        pos_all = jnp.concatenate([positions, gpos], axis=0)
        u_all = jnp.concatenate([u, gu], axis=0)
        v_all = jnp.concatenate([v, gv], axis=0)
        r2row = jnp.concatenate(
            [jnp.full((n,), 1.0, jnp.float32) * r2,
             jnp.where(gvalid, r2, -1.0).astype(jnp.float32)])
        imask = jnp.concatenate(
            [jnp.ones((n,), jnp.float32), gvalid.astype(jnp.float32)])
    else:
        pos_all, u_all, v_all = positions, u, v
        r2row = jnp.full((n,), 1.0, jnp.float32) * r2
        imask = jnp.ones((n,), jnp.float32)

    m = pos_all.shape[0]
    if t is None:
        t = 640 if cfg.force_law == "particle_life" else 512
    t = min(t, max(8, _round_to(m, 8)))

    p4 = jnp.concatenate(
        [pos_all.astype(jnp.float32),
         jnp.ones((m, 1), jnp.float32)], axis=1)
    out = _mxu_call(p4, u_all, v_all, imask, r2row, pack_params(cfg),
                    cfg.force_law, precision == "fast", t, interpret)
    return out[:n].astype(positions.dtype)
