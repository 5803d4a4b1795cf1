"""Pallas column-sweep cell-list kernel — the large-N production force path.

TPU-native successor to the reference's spatial hash (``src/lib.rs:134-164``)
for bounded-density systems. The XLA cell list (celllist.py) is correct but
gather-bound; this kernel restructures the sweep around DMA-friendly,
contiguous memory:

  * particles are binned into a ``nsc^3`` SUPERCELL grid (cell width >=
    cutoff) and sorted into a column-major dense layout: one z-column of
    supercells per (x, y) — each column's slots are contiguous, z-minor.
  * columns carry one ghost supercell at each z end (wrapped copy for
    periodic boxes, masked padding otherwise) so every z-window is one
    contiguous slice.
  * the kernel grid iterates columns; the 9 (x, y)-neighbor columns arrive as
    index-mapped BlockSpecs of the same dense arrays — XLA/Mosaic pipelines
    the 9 column DMAs, no gather ops anywhere.
  * inside, a fori loop walks z in chunks of ZR supercells: the receiver
    chunk (ZR*cap rows) sweeps the (ZR+2)-supercell window of all 9 columns —
    a fat [ZR*cap, 9*(ZR+2)*cap] VPU tile. The radius gate (with the r2row
    padding trick from pallas_allpairs) rejects the out-of-window-but-in-
    tile candidates, so results are exactly the all-pairs forces. Periodic
    images are COLUMN-LEVEL, not per-pair: z ghosts carry +-w-shifted
    coordinates and wrapped x/y neighbors get one scalar +-w shift folded
    into their window slice (see _kernel), so the hot tile runs zero
    minimum-image passes.
  * non-periodic edges need no masking: a clamped out-of-range neighbor
    column is geometrically distant, so the distance gate rejects it.

Each receiver chunk owns disjoint output rows and sees each source slot at
most once, so there is no cross-step accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from . import forces as F
from .pallas_allpairs import (
    PAIR_P, _scale, pack_params, _r2_gate, _use_interpret)

_OFFSETS9 = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _kernel(pf_ref, rec_pos_ref, rec_u_ref, *rest,
            law: str, wrap: bool, halo: bool, nsc: int, cap: int, zr: int,
            zr2: int, use_rsqrt: bool, unroll: bool = False):
    src_pos = rest[0:9]      # each (1, 3, G) ghosted column, G=(nsc+2)*cap
    src_vt = rest[9:18]      # each (1, P, G)
    src_r2 = rest[18:27]     # each (1, 1, G)
    out_ref = rest[27]
    w = pf_ref[0]

    # COLUMN-LEVEL periodic images replace per-pair minimum-image (round 4):
    # a neighbor column that wrapped in x/y sits a whole box away, so ONE
    # scalar +-w shift per (neighbor, axis) — applied to the 1-row source
    # slices below, ~1.5% of the pair tile — makes every in-gate delta the
    # true displacement with NO per-pair round/sub passes (z images are
    # pre-shifted in the ghost cells at ghosting time). Exactness for
    # nsc >= 3: a shifted |delta| can only disagree with the minimum image
    # when the true separation is >= cellw >= cutoff, which the r2 gate
    # rejects either way. Measured: 6 of ~30 VPU passes per pair-slot
    # removed (plus the pre-scale passes) — see docs/PERF.md round 4.
    if wrap:
        c = pl.program_id(0)
        cy = jax.lax.rem(c, nsc)
        cx = jax.lax.div(c, nsc)  # plane index in halo mode (x never wraps)
        zero = jnp.float32(0.0)
        shifts = []
        for dx, dy in _OFFSETS9:
            if halo:
                sx = zero
            else:
                nx = cx + dx
                sx = jnp.where(nx < 0, -w, jnp.where(nx >= nsc, w, zero))
            ny = cy + dy
            sy = jnp.where(ny < 0, -w, jnp.where(ny >= nsc, w, zero))
            shifts.append((sx, sy))
    else:
        shifts = [(None, None)] * 9

    ti = zr * cap            # receiver rows per chunk
    wl = (zr + 2) * cap      # window rows per column
    nchunks = nsc // zr
    # z sub-chunking: the chunk's DMA windows must start 128-lane aligned
    # (hence zr*cap % 128 == 0), but a zr2-supercell receiver group only
    # interacts with a (zr2+2)-supercell sub-window — carving it with STATIC
    # slices of the loaded window values cuts the VPU pair-op tile from
    # [ti, 9*(zr+2)*cap] to nsub x [ti2, 9*(zr2+2)*cap]: ~2.3x fewer
    # pair-lane-ops at zr=8, zr2=2, cap=16 (measured on v5e).
    ti2 = zr2 * cap
    swl = (zr2 + 2) * cap
    nsub = zr // zr2

    def chunk(ch, _):
        # core-coord row == ghosted-coord window start. Under ``unroll``
        # ``ch`` is a python int, so every slice below is STATIC — Mosaic's
        # 128-lane alignment requirement applies only to DYNAMIC window
        # starts, which is what frees cell capacities from the
        # zr*cap % 128 == 0 constraint (see _pick_zr / _call round 4).
        base = ch * ti
        win = pl.ds(base, wl)
        cols_x = [r[0, 0:1, win] for r in src_pos]
        cols_y = [r[0, 1:2, win] for r in src_pos]
        cols_z = [r[0, 2:3, win] for r in src_pos]
        cols_v = [r[0, :, win] for r in src_vt]
        cols_r2 = [r[0, 0:1, win] for r in src_r2]

        rec = pl.ds(base, ti)
        # receiver refs are TRANSPOSED ([1, 3|P, CS], slot-minor) so the
        # XLA-side operands need no 128-lane padding of the tiny 3/P dim —
        # the row-major custom-call operands otherwise materialize as
        # slots x 512 B tiled temps (measured 42.7x/16x inflation, the
        # single-chip HBM ceiling; docs/PERF.md). One small (3|P, TI) ->
        # (TI, 3|P) in-kernel transpose per chunk restores the compute
        # orientation; pair-tile work dominates it ~100x.
        pos_t = jnp.transpose(rec_pos_ref[0, :, rec], (1, 0))  # (TI, 3)
        xi_t = pos_t[:, 0:1]
        yi_t = pos_t[:, 1:2]
        zi_t = pos_t[:, 2:3]
        u_t = jnp.transpose(rec_u_ref[0, :, rec], (1, 0))      # (TI, P)

        accs = []
        for sub in range(nsub):
            off = sub * ti2
            sl = slice(off, off + swl)
            if wrap:
                # scalar image shifts fold into the [1, SWL] slice copies
                # (see header comment) — self-pair deltas stay exactly
                # zero: the own column's shift is exactly 0.0 and xi / xj
                # read the same materialized value
                xj = jnp.concatenate(
                    [c[:, sl] + s[0] for c, s in zip(cols_x, shifts)], axis=1)
                yj = jnp.concatenate(
                    [c[:, sl] + s[1] for c, s in zip(cols_y, shifts)], axis=1)
            else:
                xj = jnp.concatenate([c[:, sl] for c in cols_x], axis=1)
                yj = jnp.concatenate([c[:, sl] for c in cols_y], axis=1)
            zj = jnp.concatenate([c[:, sl] for c in cols_z], axis=1)
            vt = jnp.concatenate([c[:, sl] for c in cols_v], axis=1)
            r2row = jnp.concatenate([c[:, sl] for c in cols_r2], axis=1)
            xi = xi_t[off:off + ti2]
            yi = yi_t[off:off + ti2]
            zi = zi_t[off:off + ti2]
            u = u_t[off:off + ti2]

            dx = xj - xi
            dy = yj - yi
            dz = zj - zi
            d2 = dx * dx + dy * dy + dz * dz
            in_r = d2 < r2row
            coef = jnp.dot(u, vt, preferred_element_type=jnp.float32)
            if law == "particle_life":
                safe = jnp.where(in_r, jnp.maximum(d2, 1e-12), 1.0)
                sca = _scale(law, safe, coef, pf_ref, None, use_rsqrt)
            elif law == "gravity":
                # d2 > 0 guards softening == 0 (NaN poisoning); see
                # pallas_allpairs
                valid = jnp.logical_and(d2 > 0.0, in_r)
                safe = jnp.where(valid, d2, 1.0)
                sca = _scale(law, safe, coef, pf_ref, valid, use_rsqrt)
            else:
                valid = jnp.logical_and(d2 > 0.0, in_r)
                safe = jnp.where(valid, d2, 1.0)
                sca = _scale(law, safe, coef, pf_ref, valid, use_rsqrt)
            acc = jnp.concatenate(
                [
                    jnp.sum(dx * sca, axis=1, keepdims=True),
                    jnp.sum(dy * sca, axis=1, keepdims=True),
                    jnp.sum(dz * sca, axis=1, keepdims=True),
                ],
                axis=1,
            )
            accs.append(acc)
        acc_all = accs[0] if nsub == 1 else jnp.concatenate(accs, 0)
        out_ref[0, :, rec] = jnp.transpose(acc_all, (1, 0))  # (3, TI)
        return 0

    if unroll:
        for ch in range(nchunks):
            chunk(ch, 0)
    else:
        jax.lax.fori_loop(0, nchunks, chunk, 0)


def _pick_zr(nsc: int, cap: int, require_aligned: bool = False) -> int:
    """Largest chunk height with TI=zr*cap near 128-256 that divides nsc.

    Capped at nsc-2: a window of zr+2 supercells must never contain both a
    core supercell and its wrap-ghost copy, or wrapped pairs double count.

    On real TPUs the chunk offsets (zr*cap) MUST be 128-lane aligned —
    Mosaic rejects the kernel's dynamic VMEM window loads otherwise (an
    opaque compile failure); ``require_aligned=True`` turns that into a
    clear error listing working capacities.
    """
    target = max(1, 256 // max(cap, 1))
    for aligned in (True, False):
        if require_aligned and not aligned:
            break
        for zr in range(min(target, nsc - 2), 0, -1):
            if nsc % zr == 0 and (not aligned or (zr * cap) % 128 == 0):
                return zr
        # aligned but larger than the latency target still compiles fine
        for zr in range(min(target, nsc - 2) + 1, nsc - 1):
            if nsc % zr == 0 and (zr * cap) % 128 == 0:
                return zr
    if require_aligned:
        ok = sorted(c for c in range(1, 257) if any(
            nsc % zr == 0 and (zr * c) % 128 == 0
            for zr in range(1, nsc - 1)))
        raise ValueError(
            f"cell_capacity={cap} has no 128-lane-aligned z-chunking for "
            f"cell_grid={nsc} (Mosaic requires zr*cap % 128 == 0 with zr "
            f"dividing {nsc}); working capacities include "
            f"{[c for c in ok if c <= 4 * cap][:12]}")
    return 1


def kernel_vmem_bytes(nsc: int, cap: int) -> int:
    """Estimated resident VMEM of one grid step of the column kernel.

    27 ghosted source blocks + 3 receiver/output blocks, all sublane-padded
    (3/P/1 rows -> 8) since the slot-minor relayout — the receivers used to
    lane-pad to 128 and dominated this model. Recalibrated on fresh v5e
    probes of the relayouted kernel: (40, 320) OOMs at 16.35 MB scoped
    (factor 1.273 over the raw sum); (40, 256), (44, 256), (60, 64) and
    (40, 128) — both former OOM points of the OLD layout — compile.
    Factor 1.28 with the 15.2 MB budget accepts every probed-good geometry
    and rejects the probed OOMs. Used to gate capacity escalation BEFORE
    Mosaic hits the hard 16 MB scoped limit; the deeper feasible caps
    (256 at nsc=40 vs 80 pre-relayout) extend the clustering escalation
    ladder.

    The second term tracks the per-chunk working set (receiver chunk rows
    ti = zr*cap times the window length wl = (zr+2)*cap): the blocks-only
    model accepted (28, 288) — where alignment forces zr=4, ti=1152 — and
    Mosaic needed 16.82 MB. With the ti*wl term (coefficient 0.8 fit on
    that miss) every probed-good geometry passes and all three observed
    OOMs are rejected. A model miss on an ESCALATED rung is survivable
    anyway: ``simulate_dense_adaptive`` catches the compile failure and
    ends the ladder."""
    g = (nsc + 2) * cap
    cs = nsc * cap
    try:
        zr = _pick_zr(nsc, cap, require_aligned=True)
    except ValueError:
        return 1 << 62  # no aligned chunking: infeasible regardless
    ti = zr * cap
    wl = (zr + 2) * cap
    return int(1.28 * (27 * 8 * g * 4 + 3 * 8 * cs * 4) + 0.8 * 4 * ti * wl)


_VMEM_BUDGET = 15_200_000


def max_feasible_cap(nsc: int) -> int:
    """Largest aligned capacity whose kernel fits the scoped-VMEM budget."""
    best = 0
    for cap in range(1, 4096):
        try:
            _pick_zr(nsc, cap, require_aligned=True)
        except ValueError:
            continue  # no aligned chunking at this cap; larger may align
        # NOT monotone in cap: awkward caps force larger zr (alignment),
        # inflating the ti*wl working-set term — scan the full range
        if kernel_vmem_bytes(nsc, cap) <= _VMEM_BUDGET:
            best = cap
    return best


def _pick_zr2(zr: int, cap: int) -> int:
    """Sub-chunk height (supercells). zr2=2 measured fastest at BOTH
    production geometries on the v5e — (zr=8, cap=16): 23.4/17.8/15.5/20.1
    ms per 262k sweep for zr2=8/4/2/1; (zr=4, cap=32): 17.8/13.5/14.1 for
    zr2=4/2/1 — and no single-constant block-count model reproduces both
    orderings (the per-sub overhead does not scale simply). Prefer 2
    whenever it is a valid divisor with 8-sublane-aligned receiver rows;
    otherwise fall back to a padded lane-block count with a fitted fixed
    per-sub term."""
    if zr % 2 == 0 and (2 * cap) % 8 == 0:
        return 2
    best, best_cost = zr, None
    for z2 in range(1, zr + 1):
        if zr % z2 or (z2 * cap) % 8:
            continue
        blocks = (-(-(z2 * cap) // 8)) * (-(-(9 * (z2 + 2) * cap) // 128))
        cost = (zr // z2) * (blocks + 14)
        if best_cost is None or cost <= best_cost:
            best, best_cost = z2, cost
    return best


@functools.partial(
    jax.jit,
    static_argnames=("law", "wrap", "nsc", "cap", "interpret", "halo", "zr2"),
)
def _call(pos_d, u_d, post_g, vt_g, r2_g, params_f, law, wrap, nsc, cap,
          interpret, halo: bool = False, zr2: int | None = None):
    """halo=True: receiver columns are a contiguous x-slab and the SOURCE
    arrays carry one extra x-plane of halo columns at each end (domain
    decomposition, parallel/domain_sharded.py) — the x neighbor index is
    then a plain local offset (+nsc per plane) instead of a periodic wrap,
    while y stays periodic within each plane.

    Receiver operands and the output are SLOT-MINOR: ``pos_d [NCOL, 3,
    CS]``, ``u_d [NCOL, P, CS]``, out ``[NCOL, 3, CS]`` — same orientation
    as the ghosted source arrays. Row-major slot-major receiver layouts
    ([NCOL, CS, 3]) force XLA to pad the 3/P minor dim to 128 lanes in the
    custom-call operand temps (slots x 512 B each — measured as the
    single-chip HBM ceiling at ~9-11M slots, docs/PERF.md)."""
    ncol = pos_d.shape[0]
    cs = nsc * cap
    g = (nsc + 2) * cap
    p = u_d.shape[1]
    # Mosaic's 128-lane alignment rule binds only DYNAMIC in-kernel window
    # starts (the fori_loop chunk offsets). Capacities with no aligned
    # z-chunking run the z loop UNROLLED — every slice static — which
    # compiles at any zr*cap and frees `cap` to hug the mean occupancy
    # (round 4; measured equivalent and timed in docs/PERF.md round 4).
    try:
        zr = _pick_zr(nsc, cap, require_aligned=not interpret)
        unroll = False
    except ValueError:
        zr = _pick_zr(nsc, cap, require_aligned=False)
        unroll = True
    if zr2 is None or zr2 > zr or zr % zr2 or (zr2 * cap) % 8:
        zr2 = _pick_zr2(zr, cap)

    def rec_map(c):
        return (c, 0, 0)

    # non-periodic neighbor maps send out-of-range offsets to the fully-
    # masked dummy column the caller appends LAST (aliasing a real column
    # would double count edge pairs); in every layout that index is one
    # past the real source columns
    dummy_col = post_g.shape[0] - 1

    def nbr_map(dx, dy):
        def im(c):
            if halo:
                plane = c // nsc + 1  # +1: source arrays lead with a halo plane
                cy = c % nsc
                if wrap:
                    return ((plane + dx) * nsc + (cy + dy) % nsc, 0, 0)
                # walled slab: x neighbors stay local halo offsets (edge
                # devices receive force-dead halo planes from the ring —
                # parallel/domain_sharded.halo_forces masks them), but y
                # does not wrap
                ny = cy + dy
                ok = (ny >= 0) & (ny < nsc)
                return (jnp.where(ok, (plane + dx) * nsc + ny, dummy_col),
                        0, 0)
            cx = c // nsc
            cy = c % nsc
            if wrap:
                nx = (cx + dx) % nsc
                ny = (cy + dy) % nsc
                return (nx * nsc + ny, 0, 0)
            nx = cx + dx
            ny = cy + dy
            ok = (nx >= 0) & (nx < nsc) & (ny >= 0) & (ny < nsc)
            return (jnp.where(ok, nx * nsc + ny, dummy_col), 0, 0)

        return im

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 3, cs), rec_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, p, cs), rec_map, memory_space=pltpu.VMEM),
    ]
    for dx, dy in _OFFSETS9:
        in_specs.append(pl.BlockSpec((1, 3, g), nbr_map(dx, dy),
                                     memory_space=pltpu.VMEM))
    for dx, dy in _OFFSETS9:
        in_specs.append(pl.BlockSpec((1, p, g), nbr_map(dx, dy),
                                     memory_space=pltpu.VMEM))
    for dx, dy in _OFFSETS9:
        in_specs.append(pl.BlockSpec((1, 1, g), nbr_map(dx, dy),
                                     memory_space=pltpu.VMEM))

    args = ([params_f, pos_d, u_d] + [post_g] * 9 + [vt_g] * 9 + [r2_g] * 9)

    out = pl.pallas_call(
        functools.partial(
            _kernel, law=law, wrap=wrap, halo=halo, nsc=nsc, cap=cap, zr=zr,
            zr2=zr2, use_rsqrt=not interpret, unroll=unroll,
        ),
        grid=(ncol,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 3, cs), rec_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ncol, 3, cs), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*args)
    return out


def fold_to_cells(pos_r, w, nsc: int, cap: int, col0_x: int | None = None,
                  x_of_col=None):
    """Fold each slot's coordinates into the periodic image nearest its
    CELL center. The kernel's column-level image scheme (see _kernel)
    assumes every stored coordinate lies near its slot's cell — true right
    after a (re)build, but an occupant that wrap-crossed the box on a STALE
    layout (cadenced windows; verlet/leapfrog's post-boundary force eval)
    sits a whole box from its cell and would silently miss its near-
    boundary pairs. Four VPU passes over [S, 3] — O(slots) — restore the
    invariant exactly: unwrapped occupants fold by w * round(0) == 0.0
    (bit-identical), wrapped ones by exactly +-w.

    ``x_of_col`` overrides the per-column global x cell index (the slab
    decomposition's columns are a LOCAL x-plane window of the global grid).
    """
    ncol, cs = pos_r.shape[0], pos_r.shape[1]
    cellw = w / nsc
    col = jnp.arange(ncol, dtype=jnp.int32)
    gx = x_of_col if x_of_col is not None else col // nsc
    if col0_x is not None:  # may be traced (slab device offset)
        gx = gx + col0_x
    ctr_x = (gx.astype(jnp.float32) + 0.5) * cellw - 0.5 * w
    ctr_y = ((col % nsc).astype(jnp.float32) + 0.5) * cellw - 0.5 * w
    zc = jnp.arange(cs, dtype=jnp.int32) // cap
    ctr_z = (zc.astype(jnp.float32) + 0.5) * cellw - 0.5 * w
    ctr = jnp.stack([
        jnp.broadcast_to(ctr_x[:, None], (ncol, cs)),
        jnp.broadcast_to(ctr_y[:, None], (ncol, cs)),
        jnp.broadcast_to(ctr_z[None, :], (ncol, cs)),
    ], axis=-1)
    return pos_r - w * jnp.round((pos_r - ctr) / w)


def prepare_columns(positions, u, v, cfg: SimConfig, nsc: int, cap: int):
    """Bin + sort into the column-dense ghosted layout.

    Returns (pos_d [NCOL,3,CS], u_d [NCOL,P,CS], post_g [NCOL,3,G],
    vt_g [NCOL,P,G], r2_g [NCOL,1,G], slot_particle [NCOL,CS]) — receiver
    arrays slot-minor like the sources (see ``_call``).
    """
    n = positions.shape[0]
    w = jnp.asarray(cfg.world_size, jnp.float32)
    cellw = w / nsc
    ncol = nsc * nsc
    cs = nsc * cap

    shifted = positions + w * 0.5
    idx3 = jnp.clip(jnp.floor(shifted / cellw).astype(jnp.int32), 0, nsc - 1)
    sid = (idx3[:, 0] * nsc + idx3[:, 1]) * nsc + idx3[:, 2]
    order = jnp.argsort(sid)
    sid_s = sid[order]
    starts = jnp.searchsorted(sid_s, jnp.arange(nsc ** 3, dtype=sid.dtype))
    rank = jnp.arange(n, dtype=jnp.int32) - starts[sid_s].astype(jnp.int32)
    keep = rank < cap
    flat = jnp.where(keep, sid_s * cap + rank, nsc ** 3 * cap)
    slot_particle = jnp.full((nsc ** 3 * cap + 1,), -1, jnp.int32)
    slot_particle = slot_particle.at[flat].set(order.astype(jnp.int32),
                                               mode="drop")[:-1]
    present = slot_particle >= 0
    safe = jnp.where(present, slot_particle, 0)

    pos_r = positions[safe].reshape(ncol, cs, 3).astype(jnp.float32)
    u_r = u[safe].reshape(ncol, cs, -1).astype(jnp.float32)
    pos_d = jnp.transpose(pos_r, (0, 2, 1))
    u_d = jnp.transpose(u_r, (0, 2, 1))
    v_d = v[safe].reshape(ncol, cs, -1).astype(jnp.float32)
    r2 = _r2_gate(cfg)
    r2_d = jnp.where(present, r2, -1.0).reshape(ncol, cs).astype(jnp.float32)

    wrap = bool(cfg.wrap_forces)
    if wrap:
        # z ghosts carry COORDINATE-SHIFTED images (+-w on the z channel):
        # in-kernel deltas are then true displacements with no per-pair
        # minimum-image passes (see _kernel's column-level image comment)
        zs = jnp.zeros((3,), jnp.float32).at[2].set(w)
        pos_g = jnp.concatenate(
            [pos_r[:, cs - cap:] - zs, pos_r, pos_r[:, :cap] + zs], axis=1)
        v_g = jnp.concatenate([v_d[:, cs - cap:], v_d, v_d[:, :cap]], axis=1)
        r2_gh = jnp.concatenate([r2_d[:, cs - cap:], r2_d, r2_d[:, :cap]], axis=1)
    else:
        zpad3 = jnp.zeros((ncol, cap, 3), jnp.float32)
        zpadp = jnp.zeros((ncol, cap, v_d.shape[2]), jnp.float32)
        mpad = jnp.full((ncol, cap), -1.0, jnp.float32)
        pos_g = jnp.concatenate([zpad3, pos_r, zpad3], axis=1)
        v_g = jnp.concatenate([zpadp, v_d, zpadp], axis=1)
        r2_gh = jnp.concatenate([mpad, r2_d, mpad], axis=1)
        # dummy fully-masked column for out-of-range neighbor maps
        g = cs + 2 * cap
        pos_g = jnp.concatenate([pos_g, jnp.zeros((1, g, 3), jnp.float32)], 0)
        v_g = jnp.concatenate([v_g, jnp.zeros((1, g, v_g.shape[2]), jnp.float32)], 0)
        r2_gh = jnp.concatenate([r2_gh, jnp.full((1, g), -1.0, jnp.float32)], 0)

    post_g = jnp.transpose(pos_g, (0, 2, 1))  # (NCOL[+1], 3, G)
    vt_g = jnp.transpose(v_g, (0, 2, 1))  # (NCOL[+1], P, G)
    r2_g = r2_gh[:, None, :]  # (NCOL[+1], 1, G)
    return pos_d, u_d, post_g, vt_g, r2_g, slot_particle.reshape(ncol, cs)


def pallas_celllist_forces(positions, u, v, cfg: SimConfig,
                           nsc: int | None = None, cap: int | None = None,
                           interpret: bool | None = None):
    """Accumulated pair forces [N,3] via the column-sweep cell kernel.

    nsc (supercells per axis, width must be >= the effective cutoff) and cap
    (slots per supercell) come from cfg.cell_grid / cfg.cell_capacity when
    not given. Falls back to the XLA cell list when nsc < 3.
    """
    n = positions.shape[0]
    if nsc is None:
        nsc = cfg.cell_grid
    if cap is None:
        cap = cfg.cell_capacity
    if nsc is None:
        from .celllist import grid_dims

        nsc = grid_dims(float(cfg.world_size), float(cfg.particle_effect_radius))
    if cap is None:
        from .celllist import default_capacity

        cap = default_capacity(n, nsc, slack=2.5)
    if nsc < 3:
        from .celllist import celllist_forces

        return celllist_forces(positions, u, v, cfg, nc=nsc, capacity=cap)
    # correctness requires supercell width >= effective cutoff (best-effort
    # check when the config is concrete)
    try:
        w = float(cfg.world_size)
        r = float(cfg.particle_effect_radius)
        cutoff = min(r, 1.0) if cfg.force_law == "particle_life" else r
        if w / nsc < cutoff - 1e-6:
            raise ValueError(
                f"cell width {w / nsc:.4f} < effective cutoff {cutoff:.4f}: "
                f"reduce cell_grid (nsc={nsc}) so cells cover the cutoff")
    except TypeError:
        pass  # traced config: caller is responsible for nsc
    if interpret is None:
        interpret = _use_interpret()
    if u.shape[1] < PAIR_P:
        pad = PAIR_P - u.shape[1]
        u = jnp.pad(u, ((0, 0), (0, pad)))
        v = jnp.pad(v, ((0, 0), (0, pad)))

    pos_d, u_d, post_g, vt_g, r2_g, slot_particle = prepare_columns(
        positions, u, v, cfg, nsc, cap)
    params_f = pack_params(cfg)
    forces_d = _call(pos_d, u_d, post_g, vt_g, r2_g, params_f,
                     cfg.force_law, bool(cfg.wrap_forces), nsc, cap, interpret)

    out = jnp.zeros((n + 1, 3), positions.dtype)
    flat = jnp.where(slot_particle >= 0, slot_particle, n).reshape(-1)
    slotf = jnp.transpose(forces_d, (0, 2, 1)).reshape(-1, 3)

    # round 4: capacity-overflow particles (prepare_columns drops cell rank
    # >= cap) get EXACT forces from the overflow sidecar instead of riding
    # the sweep force-dead — the same capacity/Poisson-tail decoupling the
    # production dense path uses (ops/overflow.py), so mean-occupancy
    # geometries are exact on this fresh-build path too. Straight-line (no
    # cond — see engine.step._sidecar_apply): dead worklist entries
    # contribute exact zeros, and f_from folds into the one existing
    # slot->particle scatter.
    from .celllist_dense import OCAP
    from .compaction import masked_indices
    from .overflow import neighborhood_sweeps

    ocap = OCAP if cfg.overflow_capacity is None else cfg.overflow_capacity
    if ocap:
        slot = slot_particle.reshape(-1)
        s_tot = slot.shape[0]
        inv = jnp.full((n + 1,), -1, jnp.int32)
        inv = inv.at[jnp.where(slot >= 0, slot, n)].set(
            jnp.arange(s_tot, dtype=jnp.int32), mode="drop")
        dropped = inv[:n] < 0
        mis_p = masked_indices(dropped, ocap, fill_value=n)
        safe = jnp.where(slot >= 0, slot, 0)
        pos_s = positions[safe].astype(jnp.float32)
        u_s = u[safe].astype(jnp.float32)
        v_s = v[safe].astype(jnp.float32)
        mp = jnp.minimum(mis_p, n - 1)
        f_mis, f_from = neighborhood_sweeps(
            pos_s, u_s, v_s, slot >= 0,
            positions[mp].astype(jnp.float32),
            u[mp].astype(jnp.float32), v[mp].astype(jnp.float32),
            mis_p < n, cfg, nsc, cap)
        out = out.at[mis_p].add(f_mis.astype(out.dtype))
        slotf = slotf + f_from.astype(slotf.dtype)
    out = out.at[flat].add(slotf)
    return out[:n]


# ---------------------------------------------------------------------------
# Cadenced rebuild: reuse the sorted layout across steps
# ---------------------------------------------------------------------------
#
# Binning only needs to be *valid*, not fresh: a pair within the cutoff is
# still covered by the +/-1 supercell window as long as every particle has
# drifted less than (cell_width - cutoff)/2 since the layout was built. The
# expensive part of a rebuild is the sort + scatter (the layout); refreshing
# VALUES (positions) into an existing layout is one gather. Species/mass
# features and the r2 row are layout-constant and cached.

import dataclasses
from typing import Any


@dataclasses.dataclass(frozen=True)
class CellLayout:
    """Frozen binning of particles into the column-dense layout."""

    slot_particle: Any  # i32 [NCOL, CS], -1 padding
    u_d: Any            # f32 [NCOL, P, CS] cached receiver features (slot-minor)
    vt_g: Any           # f32 [NCOL(+1), P, G] cached ghosted source features
    r2_g: Any           # f32 [NCOL(+1), 1, G]
    anchor: Any         # f32 [N, 3] positions at build time (drift checks)


jax.tree_util.register_dataclass(
    CellLayout,
    data_fields=["slot_particle", "u_d", "vt_g", "r2_g", "anchor"],
    meta_fields=[],
)


def build_layout(positions, u, v, cfg: SimConfig, nsc: int, cap: int) -> CellLayout:
    if u.shape[1] < PAIR_P:
        pad = PAIR_P - u.shape[1]
        u = jnp.pad(u, ((0, 0), (0, pad)))
        v = jnp.pad(v, ((0, 0), (0, pad)))
    _, u_d, _, vt_g, r2_g, slot_particle = prepare_columns(
        positions, u, v, cfg, nsc, cap)
    return CellLayout(slot_particle, u_d, vt_g, r2_g, positions)


def slot_of_particle(layout: CellLayout, n: int):
    """Inverse slot mapping: i32[N] flat slot index per particle, -1 for
    particles dropped by capacity overflow."""
    slot = layout.slot_particle.reshape(-1)
    flat = jnp.arange(slot.shape[0], dtype=jnp.int32)
    inv = jnp.full((n + 1,), -1, jnp.int32)
    inv = inv.at[jnp.where(slot >= 0, slot, n)].set(flat, mode="drop")
    return inv[:n]


def dense_forces(layout: CellLayout, pos_flat, cfg: SimConfig,
                 nsc: int, cap: int, interpret: bool | None = None):
    """Forces for positions already IN the dense slot layout.

    pos_flat: f32[NCOL*CS, 3] -> forces f32[NCOL*CS, 3] (garbage on phantom
    slots — they are masked as sources by r2_g, and callers never read
    phantom rows back). Avoids the per-step gather/scatter entirely.
    """
    if interpret is None:
        interpret = _use_interpret()
    ncol = nsc * nsc
    cs = nsc * cap
    pos_r = pos_flat.reshape(ncol, cs, 3).astype(jnp.float32)
    wrap = bool(cfg.wrap_forces)
    if wrap:
        # stale-layout wrap crossers + coordinate-shifted z ghosts (see
        # fold_to_cells / the kernel's column-level image scheme)
        w = jnp.asarray(cfg.world_size, jnp.float32)
        pos_r = fold_to_cells(pos_r, w, nsc, cap)
        zs = jnp.zeros((3,), jnp.float32).at[2].set(w)
        pos_g = jnp.concatenate(
            [pos_r[:, cs - cap:] - zs, pos_r, pos_r[:, :cap] + zs], axis=1)
    else:
        zpad3 = jnp.zeros((ncol, cap, 3), jnp.float32)
        pos_g = jnp.concatenate([zpad3, pos_r, zpad3], axis=1)
        pos_g = jnp.concatenate(
            [pos_g, jnp.zeros((1, cs + 2 * cap, 3), jnp.float32)], axis=0)
    pos_d = jnp.transpose(pos_r, (0, 2, 1))
    post_g = jnp.transpose(pos_g, (0, 2, 1))
    params_f = pack_params(cfg)
    forces_d = _call(pos_d, layout.u_d, post_g, layout.vt_g, layout.r2_g,
                     params_f, cfg.force_law, wrap, nsc, cap, interpret)
    return jnp.transpose(forces_d, (0, 2, 1)).reshape(-1, 3)


def drift_budget(cfg: SimConfig, nsc: int):
    """Max per-particle displacement the layout tolerates."""
    w = jnp.asarray(cfg.world_size, jnp.float32)
    r = jnp.asarray(cfg.particle_effect_radius, jnp.float32)
    cutoff = jnp.minimum(r, 1.0) if cfg.force_law == "particle_life" else r
    return (w / nsc - cutoff) * 0.5


def layout_drift(layout: CellLayout, positions, cfg: SimConfig):
    """Max displacement since the layout anchor (minimum-image metric)."""
    d = F.min_image(positions - layout.anchor, cfg.world_size)
    return jnp.sqrt(jnp.max(jnp.sum(d * d, axis=-1)))


def layout_forces(layout: CellLayout, positions, cfg: SimConfig,
                  nsc: int, cap: int, interpret: bool | None = None):
    """Forces using a frozen layout for PARTICLE-ORDER positions: one gather
    into the dense slots, the kernel, one scatter back. Prefer dense_forces
    when the state already lives in the slot layout (simulate_cadenced)."""
    n = positions.shape[0]
    slot = layout.slot_particle
    present = slot >= 0
    safe = jnp.where(present, slot, 0)
    pos_flat = positions[safe.reshape(-1)]
    pos_flat = jnp.where(present.reshape(-1, 1), pos_flat,
                         jnp.zeros_like(pos_flat))
    forces_flat = dense_forces(layout, pos_flat, cfg, nsc, cap, interpret)
    out = jnp.zeros((n + 1, 3), positions.dtype)
    flat = jnp.where(present, slot, n).reshape(-1)
    out = out.at[flat].add(forces_flat)
    return out[:n]