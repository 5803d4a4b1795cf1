"""State-sharded cell list: slab domain decomposition with halo exchange.

True domain decomposition for the cell-list production path (BASELINE
config 5 prerequisite): the supercell grid's x-planes are split into
contiguous slabs, one per device, and each device OWNS the dense slot rows
of its slab — per-chip state memory is O(N/D), unlike ``domain.py`` (which
shards only compute over replicated state) and ``ring.py`` (all-pairs laws).

Built on the incrementally-maintained dense layout (``ops.celllist_dense``):

  * **Forces**: each step the two edge x-planes of every slab are exchanged
    with the ring neighbors over ICI (one ``ppermute`` per direction of a
    packed [nsc*cs, pos|V|r2] plane buffer); the column-sweep kernel then
    runs with ``halo=True`` index maps — x neighbors are local offsets into
    the halo-extended source arrays, y and z stay periodic locally. Global
    x periodicity IS the ring. Walled boxes (``wrap_forces=False``) work
    too: the two edge slabs force-kill their wraparound halo plane (r2
    channel), y/z use dead ghosts instead of wrapped copies, and
    out-of-range y neighbors hit a masked dummy column — so walls are
    supported at any N, matching the reference's boundary surface
    (``src/lib.rs:70-127``).
  * **Rebind**: movers are classified by target slab. In-slab movers use the
    local free-slot placement (conservative currently-empty rule, see
    ``celllist_dense.rebind``). Slab-crossers are packed into fixed-size
    left/right outboxes, ``ppermute``-d to the neighbor, and placed there.
    Arrivals that find their cell full wait in a per-device LIMBO buffer
    (frozen + force-invisible) and retry each step; limbo rows whose target
    moved to another slab re-enter the outbox stream. Every overflow
    degrades to force-masked/frozen particles plus a diagnostic count —
    never to wrong forces or lost particles (loss only past ``limbocap``,
    counted in ``lost``). NOTE: unlike the single-chip dense path, the
    slab path has NO overflow sidecar (``ops/overflow.py``) — capacity
    should cover the occupancy tail (the sidecar-tuned mean-hugging preset
    geometries overflow here by design), or use ``sharded_dense_adaptive``
    which escalates capacity and ends in an exact terminal rung.
    Porting the sidecar across slab boundaries (halo-extended neighborhood
    gathers + a reverse force exchange) is ROADMAP item 20.

The reference's only parallelism is shared-memory rayon threads
(``src/lib.rs:141-164``); this is the TPU-native multi-chip counterpart.

Two usage shapes:

  * ``sharded_dense_simulate(state, cfg, dt, steps, mesh)`` — state enters
    and leaves replicated (convenient for tests and checkpoints).
  * stay-sharded multi-window runs (no replicated round trips)::

        carry = build_sharded_dense(state, cfg, mesh)
        for _ in range(windows):
            carry, diag = sharded_dense_steps(carry, cfg, dt, k, mesh)
        state = gather_sharded_dense(carry, state, cfg, mesh)

    The carry's arrays are globally-shaped but sharded over the mesh axis
    (each device holds only its slab's rows), so per-chip memory stays
    O(N/D) for the whole run. For truly huge N, replace the replicated
    build input with per-device initialization feeding the same carry
    layout.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..config import SimConfig
from ..state import ParticleState
from ..ops import forces as FF
from ..ops.pallas_allpairs import PAIR_P, pack_params, _r2_gate, _use_interpret
from ..ops.pallas_celllist import _call
from ..ops.celllist_dense import (
    _POS, _VEL, _ACC, _U, _V, _WIDTH, bin_sid)
from ..ops.compaction import masked_indices
from ..engine.step import step as _step
from .mesh import AXIS


@dataclasses.dataclass(frozen=True)
class _Geom:
    """Static slab-decomposition geometry (python ints only)."""

    d: int
    nsc: int
    cap: int
    planes_local: int
    cols_local: int
    cs: int
    s_loc: int
    k_loc: int
    k_glob: int
    mcap: int
    migcap: int
    limbocap: int
    interpret: bool
    wrap: bool


def _geometry(cfg: SimConfig, mesh, n: int, nsc, cap, mcap, migcap,
              limbocap, axis: str, interpret) -> _Geom:
    if nsc is None:
        nsc = cfg.cell_grid
    if cap is None:
        cap = cfg.cell_capacity
    assert nsc is not None and cap is not None, \
        "slab decomposition needs cfg.cell_grid / cfg.cell_capacity"
    d = mesh.shape[axis]
    if nsc % d:
        raise ValueError(f"nsc={nsc} must divide by mesh axis size {d}")
    if interpret is None:
        _interp_probe = _use_interpret()
    else:
        _interp_probe = bool(interpret)
    if not _interp_probe:
        # gate the halo kernel's scoped-VMEM footprint BEFORE compiling:
        # an infeasible geometry otherwise costs a multi-minute Mosaic
        # compile that dies in the AOT helper (observed: nsc=44 cap=96 at
        # 16.07 MB vs the 16 MB limit). Same calibrated model the
        # single-chip escalation ladder uses.
        from ..ops.pallas_celllist import (
            _VMEM_BUDGET, _pick_zr, kernel_vmem_bytes, max_feasible_cap)

        # alignment first: kernel_vmem_bytes returns a 1<<62 sentinel for
        # caps with no 128-lane-aligned z-chunking, and reporting that as
        # "needs ~4.6e9 MB VMEM" buries the real (alignment) problem —
        # let _pick_zr raise its working-capacities error instead
        _pick_zr(nsc, cap, require_aligned=True)
        if kernel_vmem_bytes(nsc, cap) > _VMEM_BUDGET:
            raise ValueError(
                f"slab halo kernel at cell_grid={nsc} cell_capacity={cap} "
                f"needs ~{kernel_vmem_bytes(nsc, cap) / 1e6:.1f} MB scoped "
                f"VMEM (budget {_VMEM_BUDGET / 1e6:.0f} MB); largest "
                f"feasible capacity for this grid is "
                f"{max_feasible_cap(nsc)}")
    planes_local = nsc // d
    cols_local = planes_local * nsc
    cs = nsc * cap
    if mcap is None:
        mcap = max(512, -(-max(n // (8 * d), 1) // 128) * 128)
    if migcap is None:
        migcap = max(256, mcap // 2)
    if limbocap is None:
        limbocap = migcap
    if interpret is None:
        interpret = _use_interpret()
    return _Geom(d=d, nsc=nsc, cap=cap, planes_local=planes_local,
                 cols_local=cols_local, cs=cs, s_loc=cols_local * cs,
                 k_loc=cols_local * nsc, k_glob=nsc ** 3, mcap=mcap,
                 migcap=migcap, limbocap=limbocap, interpret=bool(interpret),
                 wrap=bool(cfg.wrap_forces))


def _assign_slots(pid, tgt_local, valid, k_loc: int, cap: int):
    """Rank rows per target cell and pick the r-th currently-free slot.

    Returns (order, dst, can): ``order`` sorts the rows by target cell;
    ``dst[i]`` is the slot for sorted row i (or s_loc when unplaceable);
    ``can`` marks placed sorted rows. Free slots are currently-empty only
    (see celllist_dense.rebind for why mover slots must not count).
    """
    m = tgt_local.shape[0]
    s_loc = pid.shape[0]
    key = jnp.where(valid, tgt_local, k_loc)
    order = jnp.argsort(key)
    key = key[order]
    valid_s = valid[order]
    iota = jnp.arange(m, dtype=jnp.int32)
    seg = jnp.concatenate([jnp.ones((1,), bool), key[1:] != key[:-1]])
    rank = iota - jax.lax.cummax(jnp.where(seg, iota, 0))
    free = (pid < 0).reshape(k_loc, cap)
    free_count = jnp.sum(free.astype(jnp.int32), axis=1)
    free_order = jnp.argsort(~free, axis=1, stable=True).astype(jnp.int32)
    kc = jnp.minimum(key, k_loc - 1)
    can = jnp.logical_and(valid_s, rank < free_count[kc])
    dst = jnp.where(
        can, kc * cap + free_order[kc, jnp.clip(rank, 0, cap - 1)], s_loc)
    return order, dst, can


def _local_build(s, cfg_in, g: _Geom, axis: str):
    """Per-device slab build from replicated state (inside shard_map).

    Returns (data, pid, limbo_data, limbo_pid, lost0)."""
    n = s.positions.shape[0]
    me = jax.lax.axis_index(axis)
    cell_lo = me * g.k_loc
    u, v = FF.pair_features(s, cfg_in, pad_p=PAIR_P)
    packed = jnp.concatenate(
        [s.positions.astype(jnp.float32),
         s.velocities.astype(jnp.float32),
         s.accel.astype(jnp.float32),
         u.astype(jnp.float32), v.astype(jnp.float32)], axis=1)
    sid = bin_sid(s.positions, cfg_in, g.nsc)
    slab = sid // (g.planes_local * g.nsc * g.nsc)
    mine = slab == me
    key = jnp.where(mine, sid, g.k_glob)
    order = jnp.argsort(key)
    key_s = key[order]
    starts = jnp.searchsorted(key_s, jnp.arange(g.k_glob + 1, dtype=key.dtype))
    rank = jnp.arange(n, dtype=jnp.int32) - starts[
        jnp.minimum(key_s, g.k_glob)].astype(jnp.int32)
    keep = jnp.logical_and(key_s < g.k_glob, rank < g.cap)
    flat = jnp.where(keep, (key_s - cell_lo) * g.cap + rank, g.s_loc)
    pid = jnp.full((g.s_loc + 1,), -1, jnp.int32)
    pid = pid.at[flat].set(order.astype(jnp.int32), mode="drop")[:-1]
    present = pid >= 0
    data = jnp.where(present[:, None], packed[jnp.where(present, pid, 0)], 0.0)

    # particles the initial build could not place (cell overflow) start in
    # limbo so they are never silently dropped
    unplaced = jnp.logical_and(key_s < g.k_glob, rank >= g.cap)
    li = masked_indices(unplaced, g.limbocap, fill_value=n)
    l_ok = li < n
    l_src = jnp.where(l_ok, order[jnp.minimum(li, n - 1)], 0)
    limbo_data = jnp.where(l_ok[:, None], packed[l_src], 0.0)
    limbo_pid = jnp.where(l_ok, l_src.astype(jnp.int32), -1)
    lost0 = jnp.maximum(
        jnp.sum(unplaced.astype(jnp.int32)) - jnp.sum(l_ok.astype(jnp.int32)),
        0)
    return data, pid, limbo_data, limbo_pid, lost0


def _make_step_body(cfg_in, dt_in, g: _Geom, axis: str, params_f,
                    species_dtype, masses_dtype):
    """The per-step closure: halo forces + integrate + rebind/migration."""
    perm_fwd = [(i, (i + 1) % g.d) for i in range(g.d)]   # to the RIGHT
    perm_bwd = [(i, (i - 1) % g.d) for i in range(g.d)]   # to the LEFT
    me = jax.lax.axis_index(axis)
    cell_lo = me * g.k_loc
    cell_global_of_slot = cell_lo + jnp.arange(g.s_loc, dtype=jnp.int32) // g.cap
    dummy_species = jnp.zeros((g.s_loc,), species_dtype)
    dummy_masses = jnp.zeros((g.s_loc,), masses_dtype)
    r2v = _r2_gate(cfg_in).astype(jnp.float32)
    nsc, cap, cs, cols_local = g.nsc, g.cap, g.cs, g.cols_local
    s_loc, k_loc, k_glob = g.s_loc, g.k_loc, g.k_glob
    mcap, migcap, limbocap, d = g.mcap, g.migcap, g.limbocap, g.d

    def halo_forces(pos_flat, dat, r2):
        pos_d = pos_flat.reshape(cols_local, cs, 3).astype(jnp.float32)
        if g.wrap:
            # fold stale wrap crossers to their cell's image (verlet /
            # leapfrog evaluate forces at post-boundary positions on the
            # pre-step layout); x centers use GLOBAL plane indices
            from ..ops.pallas_celllist import fold_to_cells

            wv0 = jnp.asarray(cfg_in.world_size, jnp.float32)
            pos_d = fold_to_cells(pos_d, wv0, nsc, cap,
                                  col0_x=me * (cols_local // nsc))
        v_d = dat[:, _V].reshape(cols_local, cs, PAIR_P)
        r2_d = r2.reshape(cols_local, cs)
        pack = jnp.concatenate(
            [pos_d, v_d, r2_d[:, :, None]], axis=-1)  # [cols, cs, 12]
        from_left = jax.lax.ppermute(pack[cols_local - nsc:], axis, perm_fwd)
        from_right = jax.lax.ppermute(pack[:nsc], axis, perm_bwd)
        if not g.wrap:
            # walled box: the ring's wraparound edge planes are not real
            # neighbors — device 0's left halo (from device d-1) and device
            # d-1's right halo (from device 0) are force-killed via their
            # r2 channel. Interior devices keep their halos untouched.
            from_left = from_left.at[..., -1].set(jnp.where(
                me == 0, -1.0, from_left[..., -1]))
            from_right = from_right.at[..., -1].set(jnp.where(
                me == d - 1, -1.0, from_right[..., -1]))
        else:
            # the ring's wraparound halos are periodic IMAGES: shift their
            # x channel a whole box so in-kernel deltas are true
            # displacements (halo mode applies no x image shift — see
            # pallas_celllist._kernel's column-level image scheme)
            wv = jnp.asarray(cfg_in.world_size, jnp.float32)
            from_left = from_left.at[..., 0].add(
                jnp.where(me == 0, -wv, 0.0))
            from_right = from_right.at[..., 0].add(
                jnp.where(me == d - 1, wv, 0.0))
        u_full = dat[:, _U].reshape(cols_local, cs, PAIR_P)

        def run_call(recv_pos, recv_u, ext):
            """One halo-mode kernel call: ext is [ncols_src, cs, 12] source
            planes LEADING and TRAILING with one halo/neighbor plane each
            (halo-mode nbr_map: source plane of receiver c = c//nsc+1+dx)."""
            pos_e = ext[..., :3]
            v_e = ext[..., 3:3 + PAIR_P]
            r2_e = ext[..., 3 + PAIR_P]
            if g.wrap:
                # coordinate-shifted z-ghost images (same scheme)
                zsh = jnp.zeros((3,), jnp.float32).at[2].set(wv)
                pos_g = jnp.concatenate(
                    [pos_e[:, cs - cap:] - zsh, pos_e, pos_e[:, :cap] + zsh],
                    axis=1)
                v_g = jnp.concatenate(
                    [v_e[:, cs - cap:], v_e, v_e[:, :cap]], axis=1)
                r2_gh = jnp.concatenate(
                    [r2_e[:, cs - cap:], r2_e, r2_e[:, :cap]], axis=1)
            else:
                # dead z ghosts (no z wrap), plus the fully-masked dummy
                # column the kernel's out-of-range y neighbors point at
                ncol_e = ext.shape[0]
                zpad3 = jnp.zeros((ncol_e, cap, 3), jnp.float32)
                zpadp = jnp.zeros((ncol_e, cap, PAIR_P), jnp.float32)
                mpad = jnp.full((ncol_e, cap), -1.0, jnp.float32)
                pos_g = jnp.concatenate([zpad3, pos_e, zpad3], axis=1)
                v_g = jnp.concatenate([zpadp, v_e, zpadp], axis=1)
                r2_gh = jnp.concatenate([mpad, r2_e, mpad], axis=1)
                gl = cs + 2 * cap
                pos_g = jnp.concatenate(
                    [pos_g, jnp.zeros((1, gl, 3), jnp.float32)], axis=0)
                v_g = jnp.concatenate(
                    [v_g, jnp.zeros((1, gl, PAIR_P), jnp.float32)], axis=0)
                r2_gh = jnp.concatenate(
                    [r2_gh, jnp.full((1, gl), -1.0, jnp.float32)], axis=0)
            out = _call(jnp.transpose(recv_pos, (0, 2, 1)),  # slot-minor
                        jnp.transpose(recv_u, (0, 2, 1)),
                        jnp.transpose(pos_g, (0, 2, 1)),
                        jnp.transpose(v_g, (0, 2, 1)),
                        r2_gh[:, None, :], params_f, cfg_in.force_law,
                        g.wrap, nsc, cap, g.interpret, halo=True)
            return jnp.transpose(out, (0, 2, 1))

        planes = cols_local // nsc
        if d == 1 or planes < 3:
            # single-call path (1-device meshes / 2-plane slabs)
            ext = jnp.concatenate([from_left, pack, from_right], axis=0)
            return run_call(pos_d, u_full, ext).reshape(-1, 3)
        # Two-phase split (ROADMAP 14): the INTERIOR planes' sources are all
        # local (a plane's x neighbors are its slab neighbors), so their
        # kernel call has no data dependency on the ppermutes — XLA's async
        # collectives (collective-permute-start/done) can fly while the bulk
        # of the force work runs; only the two EDGE-plane calls consume the
        # halos. Exactness: the three receiver groups partition the local
        # planes, and each call's source window spans exactly the receiver
        # planes' +-1 neighborhoods (leading/trailing plane in each ext).
        out_int = run_call(pos_d[nsc:cols_local - nsc],
                           u_full[nsc:cols_local - nsc], pack)
        ext_l = jnp.concatenate([from_left, pack[:2 * nsc]], axis=0)
        out_l = run_call(pos_d[:nsc], u_full[:nsc], ext_l)
        ext_r = jnp.concatenate([pack[cols_local - 2 * nsc:], from_right],
                                axis=0)
        out_r = run_call(pos_d[cols_local - nsc:],
                         u_full[cols_local - nsc:], ext_r)
        return jnp.concatenate([out_l, out_int, out_r],
                               axis=0).reshape(-1, 3)

    def body(carry, _):
        data, pid, limbo_data, limbo_pid, mx_mov, mx_mask, mx_limbo, \
            lost, shipped = carry

        aligned = jnp.logical_and(
            pid >= 0,
            bin_sid(data[:, _POS], cfg_in, nsc) == cell_global_of_slot)
        r2 = jnp.where(aligned, r2v, -1.0)

        # -- integrate ---------------------------------------------------
        def accel_fn(positions, st, c):
            f = halo_forces(positions, data, r2)
            return f * (FF.kick_scale(c) * (r2 > 0.0)[:, None])

        ps = ParticleState(positions=data[:, _POS], velocities=data[:, _VEL],
                           species=dummy_species, masses=dummy_masses,
                           accel=data[:, _ACC])
        ps = _step(ps, cfg_in, dt_in, accel_fn=accel_fn)
        data = jnp.concatenate(
            [ps.positions, ps.velocities, ps.accel, data[:, 9:]], axis=1)

        # -- extract movers ----------------------------------------------
        occupied = pid >= 0
        sid_new = bin_sid(data[:, _POS], cfg_in, nsc)
        moved = jnp.logical_and(occupied, sid_new != cell_global_of_slot)
        n_mov = jnp.sum(moved.astype(jnp.int32))

        # limbo rows re-classify every step
        tgt_l = jnp.where(limbo_pid >= 0,
                          bin_sid(limbo_data[:, _POS], cfg_in, nsc), k_glob)

        def move_phase(mcap_e: int, migcap_e: int):
            """Mover extraction + outbox migration + placement, with every
            mover/outbox-sized op priced at the given static bounds. The
            2M-point ablation (docs/PERF.md "Slab carry") showed these row
            gathers/scatters ARE the slab step's cost — the lax.cond below
            runs this at half size on ordinary steps."""
            idx_m = masked_indices(moved, mcap_e, fill_value=s_loc)
            ok_m = idx_m < s_loc
            idx_ms = jnp.minimum(idx_m, s_loc - 1)
            tgt_m = jnp.where(ok_m, sid_new[idx_ms], k_glob)
            rows_m = data[idx_ms]
            pid_m = jnp.where(ok_m, pid[idx_ms], -1)

            all_tgt = jnp.concatenate([tgt_m, tgt_l])
            all_rows = jnp.concatenate([rows_m, limbo_data], axis=0)
            all_pid = jnp.concatenate([pid_m, limbo_pid])
            all_ok = all_pid >= 0
            tslab = jnp.minimum(all_tgt, k_glob - 1) \
                // (g.planes_local * nsc * nsc)
            in_slab = jnp.logical_and(all_ok, tslab == me)
            go_left = jnp.logical_and(
                jnp.logical_and(all_ok, ~in_slab), tslab == (me - 1) % d)
            go_right = jnp.logical_and(
                jnp.logical_and(jnp.logical_and(all_ok, ~in_slab), ~go_left),
                tslab == (me + 1) % d)

            # -- outboxes (fixed size; unselected rows stay put/masked) --
            def pack_box(mask):
                bi = masked_indices(mask, migcap_e, fill_value=mask.shape[0])
                ok = bi < mask.shape[0]
                bis = jnp.minimum(bi, mask.shape[0] - 1)
                box_d = jnp.where(ok[:, None], all_rows[bis], 0.0)
                box_p = jnp.where(ok, all_pid[bis], -1)
                sel = jnp.zeros((mask.shape[0] + 1,), bool).at[bi].set(
                    True, mode="drop")[:-1]
                return box_d, box_p, sel

            boxL_d, boxL_p, selL = pack_box(go_left)
            boxR_d, boxR_p, selR = pack_box(go_right)
            sel_ship = jnp.logical_or(selL, selR)
            n_ship = jnp.sum((boxL_p >= 0).astype(jnp.int32)) + \
                jnp.sum((boxR_p >= 0).astype(jnp.int32))

            # free the slots of SHIPPED movers (first mcap_e rows are
            # movers). pid alone vacates the slot: stale data rows are
            # inert ghosts — pid=-1 makes the per-step alignment recompute
            # set r2=-1 (force-invisible as a source, garbage-masked as a
            # receiver) and the next placement overwrites the full row.
            # Same src-clear elision as celllist_dense's rebind row-op
            # diet; the ablation showed the mover-sized row scatters ARE
            # the slab step's cost driver.
            ship_src = jnp.where(sel_ship[:mcap_e], idx_m, s_loc)
            pid2 = pid.at[ship_src].set(-1, mode="drop")

            # -- pass A: place in-slab movers (mover rows only) ----------
            tgt_loc_m = jnp.where(
                in_slab[:mcap_e], all_tgt[:mcap_e] - cell_lo, -1)
            order_a, dst_a, can_a = _assign_slots(
                pid2, tgt_loc_m, in_slab[:mcap_e], k_loc, cap)
            src_a = jnp.where(can_a, idx_m[order_a], s_loc)
            vals_a = rows_m[order_a]
            pids_a = pid_m[order_a]
            pid2 = pid2.at[src_a].set(-1, mode="drop")  # data src-clear elided
            data2 = data.at[dst_a].set(vals_a, mode="drop")
            pid2 = pid2.at[dst_a].set(
                jnp.where(can_a, pids_a, -1), mode="drop")

            # -- exchange outboxes ---------------------------------------
            inL_d = jax.lax.ppermute(boxR_d, axis, perm_fwd)
            inL_p = jax.lax.ppermute(boxR_p, axis, perm_fwd)
            inR_d = jax.lax.ppermute(boxL_d, axis, perm_bwd)
            inR_p = jax.lax.ppermute(boxL_p, axis, perm_bwd)

            # -- pass B: place arrivals + retryable limbo ----------------
            limbo_keep_mask = jnp.logical_and(
                limbo_pid >= 0, ~sel_ship[mcap_e:])
            arr_d = jnp.concatenate([inL_d, inR_d, limbo_data], axis=0)
            arr_p = jnp.concatenate(
                [inL_p, inR_p, jnp.where(limbo_keep_mask, limbo_pid, -1)])
            arr_tgt = jnp.where(
                arr_p >= 0,
                bin_sid(arr_d[:, _POS], cfg_in, nsc) - cell_lo, -1)
            arr_valid = jnp.logical_and(
                arr_p >= 0, jnp.logical_and(arr_tgt >= 0, arr_tgt < k_loc))
            order_b, dst_b, can_b = _assign_slots(
                pid2, arr_tgt, arr_valid, k_loc, cap)
            data2 = data2.at[dst_b].set(arr_d[order_b], mode="drop")
            pid2 = pid2.at[dst_b].set(
                jnp.where(can_b, arr_p[order_b], -1), mode="drop")

            # -- new limbo: unplaced arrivals (incl. out-of-slab leftovers)
            left_p = jnp.where(can_b, -1, arr_p[order_b])
            left_d = arr_d[order_b]
            li2 = masked_indices(left_p >= 0, limbocap,
                                 fill_value=left_p.shape[0])
            l_ok2 = li2 < left_p.shape[0]
            lis = jnp.minimum(li2, left_p.shape[0] - 1)
            limbo_data2 = jnp.where(l_ok2[:, None], left_d[lis], 0.0)
            limbo_pid2 = jnp.where(l_ok2, left_p[lis], -1)
            n_limbo = jnp.sum((limbo_pid2 >= 0).astype(jnp.int32))
            lost_inc = jnp.maximum(
                jnp.sum((left_p >= 0).astype(jnp.int32)) - n_limbo, 0)
            return (data2, pid2, limbo_data2, limbo_pid2, n_ship, n_limbo,
                    lost_inc)

        # Bounded-work fast path (the slab counterpart of rebind's): when
        # this step's movers fit in mcap/2 AND each outbox direction's
        # crossers fit in migcap/2 — ON EVERY DEVICE (pmin agreement, so
        # the branch with its differently-shaped ppermutes is collective-
        # consistent) — run the pipeline at half static size. masked_indices
        # is ascending, so the half prefix provably holds every mover;
        # results are identical to the full-size branch. Sizes stay
        # 128-aligned for the lane-parallel compaction fast path.
        half_m = mcap // 2 // 128 * 128
        half_g = migcap // 2 // 128 * 128
        if half_m >= 512 and half_g >= 128:
            pl3 = g.planes_local * nsc * nsc
            t_slab = jnp.minimum(sid_new, k_glob - 1) // pl3
            cross = jnp.logical_and(moved, t_slab != me)
            cl = jnp.logical_and(cross, t_slab == (me - 1) % d)
            cr = jnp.logical_and(jnp.logical_and(cross, ~cl),
                                 t_slab == (me + 1) % d)
            l_slab = jnp.minimum(tgt_l, k_glob - 1) // pl3
            l_out = jnp.logical_and(limbo_pid >= 0, l_slab != me)
            ll = jnp.logical_and(l_out, l_slab == (me - 1) % d)
            lr = jnp.logical_and(jnp.logical_and(l_out, ~ll),
                                 l_slab == (me + 1) % d)
            nL = jnp.sum(cl.astype(jnp.int32)) + \
                jnp.sum(ll.astype(jnp.int32))
            nR = jnp.sum(cr.astype(jnp.int32)) + \
                jnp.sum(lr.astype(jnp.int32))
            fits = jnp.logical_and(
                n_mov <= half_m,
                jnp.logical_and(nL <= half_g, nR <= half_g))
            all_fit = jax.lax.pmin(fits.astype(jnp.int32), axis) > 0
            (data, pid, limbo_data, limbo_pid, n_ship, n_limbo,
             lost_inc) = jax.lax.cond(
                all_fit,
                lambda: move_phase(half_m, half_g),
                lambda: move_phase(mcap, migcap))
        else:
            (data, pid, limbo_data, limbo_pid, n_ship, n_limbo,
             lost_inc) = move_phase(mcap, migcap)
        lost = lost + lost_inc

        n_mask = jnp.sum(jnp.logical_and(
            pid >= 0,
            bin_sid(data[:, _POS], cfg_in, nsc) != cell_global_of_slot
        ).astype(jnp.int32))

        return (data, pid, limbo_data, limbo_pid,
                jnp.maximum(mx_mov, n_mov), jnp.maximum(mx_mask, n_mask),
                jnp.maximum(mx_limbo, n_limbo), lost,
                shipped + n_ship), None

    return body


def _reduce_diag(mx_mov, mx_mask, mx_limbo, lost, shipped, axis):
    return (jax.lax.pmax(mx_mov, axis), jax.lax.pmax(mx_mask, axis),
            jax.lax.pmax(mx_limbo, axis), jax.lax.psum(lost, axis),
            jax.lax.psum(shipped, axis))


def _gather_state(data, pid, limbo_data, limbo_pid, s, axis):
    """all_gather the slab rows back to a replicated particle-order state."""
    n = s.positions.shape[0]
    data_all = jax.lax.all_gather(data, axis, tiled=True)
    pid_all = jax.lax.all_gather(pid, axis, tiled=True)
    ld_all = jax.lax.all_gather(limbo_data, axis, tiled=True)
    lp_all = jax.lax.all_gather(limbo_pid, axis, tiled=True)

    def back(col, src_data, src_pid, base):
        idx = jnp.where(src_pid >= 0, src_pid, n)
        return jnp.pad(base, ((0, 1), (0, 0))).at[idx].set(
            src_data[:, col], mode="drop")[:n]

    out = s
    for name, col in (("positions", _POS), ("velocities", _VEL),
                      ("accel", _ACC)):
        base = getattr(s, name).astype(jnp.float32)
        a = back(col, data_all, pid_all, base)
        a = back(col, ld_all, lp_all, a)
        out = out.replace(**{name: a})
    return out


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "num_steps", "nsc", "cap", "mcap", "migcap", "limbocap", "axis", "mesh",
    "interpret"))
def sharded_dense_simulate(state: ParticleState, cfg: SimConfig, dt,
                           num_steps: int, mesh, nsc: int | None = None,
                           cap: int | None = None, mcap: int | None = None,
                           migcap: int | None = None,
                           limbocap: int | None = None, axis: str = AXIS,
                           interpret: bool | None = None):
    """State-sharded exact cell-list trajectory (module docstring).

    Returns ``(final_state, (max_movers, max_masked, max_limbo, lost,
    shipped_total))`` — per-device maxima / totals psum-reduced over the
    mesh. Requires ``nsc % mesh_size == 0``; periodic and walled boxes
    both supported.
    """
    n = state.positions.shape[0]
    g = _geometry(cfg, mesh, n, nsc, cap, mcap, migcap, limbocap, axis,
                  interpret)
    params_f = pack_params(cfg)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), jax.tree.map(lambda _: P(), cfg), P()),
        out_specs=(P(), (P(), P(), P(), P(), P())),
        check_vma=False,
    )
    def run(s, cfg_in, dt_in):
        data, pid, limbo_data, limbo_pid, lost0 = _local_build(
            s, cfg_in, g, axis)
        body = _make_step_body(cfg_in, dt_in, g, axis, params_f,
                               s.species.dtype, jnp.float32)
        carry0 = (data, pid, limbo_data, limbo_pid,
                  jnp.int32(0), jnp.int32(0), jnp.int32(0), lost0,
                  jnp.int32(0))
        (data, pid, limbo_data, limbo_pid, mx_mov, mx_mask, mx_limbo, lost,
         shipped), _ = jax.lax.scan(body, carry0, None, length=num_steps)
        out = _gather_state(data, pid, limbo_data, limbo_pid, s, axis)
        return out, _reduce_diag(mx_mov, mx_mask, mx_limbo, lost, shipped,
                                 axis)

    return run(state, cfg, jnp.asarray(dt, jnp.float32))


@functools.partial(jax.jit, static_argnames=(
    "nsc", "cap", "mcap", "migcap", "limbocap", "axis", "mesh", "interpret"))
def build_sharded_dense(state: ParticleState, cfg: SimConfig, mesh,
                        nsc: int | None = None, cap: int | None = None,
                        mcap: int | None = None, migcap: int | None = None,
                        limbocap: int | None = None, axis: str = AXIS,
                        interpret: bool | None = None):
    """Build the stay-sharded carry from a replicated state.

    Returns ``(data, pid, limbo_data, limbo_pid, lost)`` where the arrays
    are globally shaped ([D*s_loc, ...], [D*limbocap, ...]) but sharded over
    ``axis`` — each device materializes only its slab.
    """
    n = state.positions.shape[0]
    g = _geometry(cfg, mesh, n, nsc, cap, mcap, migcap, limbocap, axis,
                  interpret)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), jax.tree.map(lambda _: P(), cfg)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        check_vma=False,
    )
    def run(s, cfg_in):
        data, pid, limbo_data, limbo_pid, lost0 = _local_build(
            s, cfg_in, g, axis)
        return data, pid, limbo_data, limbo_pid, jax.lax.psum(lost0, axis)

    return run(state, cfg)


@functools.partial(jax.jit, static_argnames=(
    "n", "nsc", "cap", "mcap", "migcap", "limbocap", "axis", "mesh",
    "interpret"))
def init_sharded_dense(key, n: int, cfg: SimConfig, mesh,
                       nsc: int | None = None, cap: int | None = None,
                       mcap: int | None = None, migcap: int | None = None,
                       limbocap: int | None = None, axis: str = AXIS,
                       interpret: bool | None = None):
    """Initialize a uniform random scene DIRECTLY into the sharded carry —
    no O(N)-replicated stage anywhere (the config-5 16M entry point).

    Each device draws its n/D particles with x confined to its own slab
    (equal slab volumes → the same uniform density as a global draw, with
    per-slab counts fixed at n/D instead of multinomial) and builds its
    local layout from the n/D-sized sort. Particle ids are globally unique
    (device offset). Requires n % D == 0.
    """
    g = _geometry(cfg, mesh, n, nsc, cap, mcap, migcap, limbocap, axis,
                  interpret)
    if n % g.d:
        raise ValueError(f"N={n} must divide by mesh size {g.d}")
    n_loc = n // g.d

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), jax.tree.map(lambda _: P(), cfg)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        check_vma=False,
    )
    def run(key_in, cfg_in):
        me = jax.lax.axis_index(axis)
        k = jax.random.fold_in(key_in, me)
        kp, ks = jax.random.split(k)
        w = jnp.asarray(cfg_in.world_size, jnp.float32)
        slab_w = w / g.d
        x_lo = -0.5 * w + me.astype(jnp.float32) * slab_w
        pos = jax.random.uniform(kp, (n_loc, 3), jnp.float32,
                                 minval=-0.5, maxval=0.5)
        pos = pos.at[:, 0].set(
            x_lo + (pos[:, 0] + 0.5) * slab_w).at[:, 1:].multiply(w)
        species = jax.random.randint(ks, (n_loc,), 0, cfg_in.id_count)
        s_local = ParticleState(
            positions=pos,
            velocities=jnp.zeros((n_loc, 3), jnp.float32),
            species=species.astype(jnp.int32),
            masses=jnp.ones((n_loc,), jnp.float32),
            accel=jnp.zeros((n_loc, 3), jnp.float32))
        data, pid, limbo_data, limbo_pid, lost0 = _local_build(
            s_local, cfg_in, g, axis)
        # globalize the particle ids (local build numbers them 0..n_loc)
        off = (me * n_loc).astype(jnp.int32)
        pid = jnp.where(pid >= 0, pid + off, pid)
        limbo_pid = jnp.where(limbo_pid >= 0, limbo_pid + off, limbo_pid)
        return data, pid, limbo_data, limbo_pid, jax.lax.psum(lost0, axis)

    return run(key, cfg)


@functools.partial(jax.jit, static_argnames=(
    "num_steps", "nsc", "cap", "mcap", "migcap", "axis", "mesh", "interpret",
    "n"))
def sharded_dense_steps(carry, cfg: SimConfig, dt, num_steps: int, mesh,
                        nsc: int | None = None, cap: int | None = None,
                        mcap: int | None = None, migcap: int | None = None,
                        axis: str = AXIS, interpret: bool | None = None,
                        n: int | None = None):
    """Advance a stay-sharded carry by ``num_steps`` (no replicated round
    trip). Returns ``(carry, (max_movers, max_masked, max_limbo, lost,
    shipped))`` with ``lost``/``shipped`` counted for this window only.

    Pass ``n`` (the true particle count) so the mover/outbox pipelines get
    the same static sizes as ``sharded_dense_simulate`` for that N — the
    mover-sized ops are the rebind cost driver (celllist_dense.py). Without
    it the bound falls back to the slot count (nsc^3 * cap >= N):
    conservative, never wrong, but larger static ops."""
    data, pid, limbo_data, limbo_pid, lost_prev = carry
    d = mesh.shape[axis]
    limbocap = limbo_pid.shape[0] // d
    n_hint = pid.shape[0] if n is None else n
    g = _geometry(cfg, mesh, n_hint, nsc, cap, mcap, migcap, limbocap, axis,
                  interpret)
    params_f = pack_params(cfg)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis),
                  jax.tree.map(lambda _: P(), cfg), P()),
        out_specs=((P(axis), P(axis), P(axis), P(axis), P()),
                   (P(), P(), P(), P(), P())),
        check_vma=False,
    )
    def run(data, pid, limbo_data, limbo_pid, cfg_in, dt_in):
        body = _make_step_body(cfg_in, dt_in, g, axis, params_f,
                               jnp.int32, jnp.float32)
        carry0 = (data, pid, limbo_data, limbo_pid,
                  jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
                  jnp.int32(0))
        (data, pid, limbo_data, limbo_pid, mx_mov, mx_mask, mx_limbo, lost,
         shipped), _ = jax.lax.scan(body, carry0, None, length=num_steps)
        diag = _reduce_diag(mx_mov, mx_mask, mx_limbo, lost, shipped, axis)
        return (data, pid, limbo_data, limbo_pid,
                jax.lax.psum(lost, axis)), diag

    (data, pid, limbo_data, limbo_pid, lost), diag = run(
        data, pid, limbo_data, limbo_pid, cfg, jnp.asarray(dt, jnp.float32))
    return (data, pid, limbo_data, limbo_pid, lost_prev + lost), diag


@functools.partial(jax.jit, static_argnames=(
    "nsc", "cap_old", "cap_new", "limbocap_new", "axis", "mesh"))
def recap_sharded_dense(carry, cfg: SimConfig, mesh, nsc: int, cap_old: int,
                        cap_new: int, limbocap_new: int | None = None,
                        axis: str = AXIS):
    """Grow a stay-sharded carry's per-cell capacity (and optionally its
    limbo capacity) IN PLACE of a rebuild: every cell's slot block pads
    from ``cap_old`` to ``cap_new`` rows and occupants keep their slots.
    Limbo rows whose target cell is in-slab are DRAINED into the grown
    cells immediately — limbo means force-frozen, so leaving them for the
    next step's placement pass would keep the very inexactness the
    escalation rewound for. Fully sharded — nothing is replicated. Used
    by ``sharded_dense_adaptive``'s escalation ladder."""
    if cap_new < cap_old:
        raise ValueError("recap only grows: cap_new >= cap_old")
    data, pid, limbo_data, limbo_pid, lost = carry
    d = mesh.shape[axis]
    lc_old = limbo_pid.shape[0] // d
    lc_new = lc_old if limbocap_new is None else max(limbocap_new, lc_old)
    k_loc_g = nsc // d * nsc * nsc

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis),
                  jax.tree.map(lambda _: P(), cfg)),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    def run(data, pid, ld, lp, cfg_in):
        k_loc = pid.shape[0] // cap_old
        c = data.shape[1]
        d3 = jnp.pad(data.reshape(k_loc, cap_old, c),
                     ((0, 0), (0, cap_new - cap_old), (0, 0)))
        data = d3.reshape(-1, c)
        pid = jnp.pad(pid.reshape(k_loc, cap_old),
                      ((0, 0), (0, cap_new - cap_old)),
                      constant_values=-1).reshape(-1)
        ld = jnp.pad(ld, ((0, lc_new - lc_old), (0, 0)))
        lp = jnp.pad(lp, ((0, lc_new - lc_old),), constant_values=-1)

        # drain in-slab limbo rows into the grown cells (same placement
        # rule as the step's pass B); cross-slab limbo rows stay and ship
        # through the next step's outboxes
        me = jax.lax.axis_index(axis)
        cell_lo = me * k_loc_g
        tgt = jnp.where(lp >= 0,
                        bin_sid(ld[:, _POS], cfg_in, nsc) - cell_lo, -1)
        valid = jnp.logical_and(lp >= 0,
                                jnp.logical_and(tgt >= 0, tgt < k_loc))
        order, dst, can = _assign_slots(pid, tgt, valid, k_loc, cap_new)
        data = data.at[dst].set(ld[order], mode="drop")
        pid = pid.at[dst].set(jnp.where(can, lp[order], -1), mode="drop")
        keep = jnp.where(can, -1, lp[order])
        return data, pid, ld[order], keep

    data, pid, limbo_data, limbo_pid = run(data, pid, limbo_data,
                                           limbo_pid, cfg)
    return (data, pid, limbo_data, limbo_pid, lost)


def sharded_dense_adaptive(carry, cfg: SimConfig, dt, num_steps: int, mesh,
                           n: int, nsc: int | None = None,
                           cap: int | None = None, mcap: int | None = None,
                           window: int = 64, max_cap: int = 512,
                           axis: str = AXIS, verbose=None,
                           on_ladder_end: str = "exact",
                           state: "ParticleState | None" = None):
    """Capacity-adaptive stay-sharded window driver — the slab counterpart
    of ``engine.step.simulate_dense_adaptive``'s escalate-with-rewind rule
    (clustering scenes outgrow any capacity chosen from the uniform init).

    Runs ``window``-step chunks of ``sharded_dense_steps``; a window whose
    diagnostics report trouble is REWOUND (the functional carry makes that
    free — the pre-window pytree is still live) and re-run after growing
    the relevant static bound:

      * movers overflowed ``mcap``      → double mcap (recompile only),
      * particles were lost past limbo  → grow limbocap 4x (``recap``),
      * any capacity masking            → next feasible cell capacity
        (``engine.step.escalate_cap`` — same alignment + scoped-VMEM
        ladder as the single-chip driver), carry recapped in place.

    When the cell-capacity ladder ends (no aligned capacity fits the halo
    kernel's VMEM budget) — or six consecutive rewinds still leave trouble
    — ``on_ladder_end`` picks the terminal rung:

      * ``"exact"`` (default; needs ``state``): the window is NEVER
        committed with force-frozen particles. The pre-window carry is
        gathered to replicated particle order and the window runs on the
        capacity-free EXACT backend (``engine.step.simulate_culled``; plain
        all-pairs under interpret mode), preserving the single-chip
        ladder's guarantee — no committed step is ever inexact (reference
        semantics: every particle feels every in-range force every step,
        src/lib.rs:171-243). After each exact window the driver re-probes
        the slab path with a fresh ``build_sharded_dense``; a rebuild with
        zero limbo/lost re-enters sharded mode (scene dispersed). The
        exact rung REPLICATES the state across the mesh — a deliberate
        scale cliff, priced only in the regime where every sharded
        capacity has already failed.
      * ``"warn"``: commit the masked window with a loud message — masked
        particles are force-frozen for those steps, never wrong or lost
        (explicit opt-out; also the fallback when ``state`` is absent).
      * ``"raise"``: hard error.

    ``state`` is a particle-order template (its species/masses feed the
    exact backend's pair features; positions/velocities are overwritten by
    the gather). Callers using ``init_sharded_dense`` can rebuild one with
    ``init_scene`` from the same key.

    Returns ``(carry, cap, history)``; history lists
    ``(steps, cap, masked)`` per committed window (``cap`` is the string
    ``"exact"`` for terminal-rung windows, always masked == 0).
    """
    from ..engine.step import escalate_cap, simulate_culled
    from ..engine.step import simulate as _simulate

    if nsc is None:
        nsc = cfg.cell_grid
    if cap is None:
        cap = cfg.cell_capacity
    d = mesh.shape[axis]
    if mcap is None:
        mcap = max(512, -(-max(n // (8 * d), 1) // 128) * 128)
    done = 0
    history = []
    ladder_ended = False
    exact_ok = on_ladder_end == "exact" and state is not None
    exact_mode = False
    live_state = None   # replicated particle-order state while exact_mode
    culled_cap = None   # worklist capacity learned by exact windows

    def run_exact_window(k):
        nonlocal live_state, culled_cap
        if _use_interpret():
            live_state = _simulate(live_state,
                                   cfg.replace(neighbor="allpairs"), dt, k)
        else:
            live_state, stc = simulate_culled(live_state, cfg, dt, k,
                                              window=min(k, 16),
                                              verbose=verbose,
                                              wp_cap=culled_cap)
            culled_cap = stc["wp_cap"]

    def try_reenter_slab():
        """Probe the slab path from the live replicated state: a rebuild
        with zero limbo/lost means every particle fits the current
        capacity again (scene dispersed) — re-enter sharded mode."""
        nonlocal carry, exact_mode, live_state
        new_carry = build_sharded_dense(live_state,
                                        cfg.replace(cell_capacity=cap),
                                        mesh, nsc=nsc, cap=cap, mcap=mcap,
                                        axis=axis)
        limbo_n = int(jnp.sum((new_carry[3] >= 0).astype(jnp.int32)))
        if limbo_n == 0 and int(new_carry[4]) == 0:
            carry = new_carry
            exact_mode = False
            live_state = None
            if verbose:
                verbose(f"[slab-adaptive] scene fits cap={cap} again — "
                        f"re-entering the sharded slab path")

    def enter_exact(prev_carry, why):
        nonlocal exact_mode, live_state
        exact_mode = True
        live_state = gather_sharded_dense(prev_carry, state, mesh)
        if verbose:
            verbose(f"[slab-adaptive] {why} — rewinding window, serving "
                    f"exact windows on gathered state (capacity-free "
                    f"backend; replicated until the scene fits again)")

    # an overflowing initial build leaves particles in limbo, where they
    # would be silently force-frozen for the first step before pass B
    # drains them — escalate and drain BEFORE stepping so window 1 starts
    # exact (mx_limbo only sees end-of-step counts, not this)
    pre_limbo = int(jnp.sum((carry[3] >= 0).astype(jnp.int32)))
    while pre_limbo > 0:
        new_cap = escalate_cap(nsc, cap, max_cap)
        if new_cap is None:
            ladder_ended = True
            msg = (f"[slab-adaptive] {pre_limbo} initial-build overflow "
                   f"particles in limbo with no feasible larger capacity "
                   f"(cell_grid={nsc}, ladder ended at cap={cap})")
            if on_ladder_end == "raise":
                raise RuntimeError(msg)
            if exact_ok:
                enter_exact(carry, msg)
            elif verbose:
                verbose(msg)
            break
        if verbose:
            verbose(f"[slab-adaptive] draining {pre_limbo} initial-build "
                    f"limbo particles: cap={cap} -> {new_cap}")
        carry = recap_sharded_dense(carry, cfg, mesh, nsc, cap, new_cap,
                                    axis=axis)
        cap = new_cap
        pre_limbo = int(jnp.sum((carry[3] >= 0).astype(jnp.int32)))

    rewinds_here = 0  # consecutive rewinds at the same `done` (loop guard)
    while done < num_steps:
        k = min(window, num_steps - done)
        if exact_mode:
            run_exact_window(k)
            done += k
            history.append((k, "exact", 0))
            if done < num_steps:
                try_reenter_slab()
            continue
        prev = carry
        cfg_k = cfg.replace(cell_capacity=cap)
        carry, diag = sharded_dense_steps(carry, cfg_k, dt, k, mesh,
                                          nsc=nsc, cap=cap, mcap=mcap,
                                          axis=axis, n=n)
        mov, mask, limbo, lost, _ = (int(x) for x in diag)
        trouble = mask + limbo  # both mean force-frozen particles
        if mov > mcap and rewinds_here < 6:
            mcap = -(-(2 * mov) // 128) * 128
            if verbose:
                verbose(f"[slab-adaptive] step {done}: {mov} movers > "
                        f"mover cap — rewinding window, mcap={mcap}")
            carry = prev
            rewinds_here += 1
            continue
        if lost > 0 and rewinds_here < 6:
            lc = prev[3].shape[0] // d
            if verbose:
                verbose(f"[slab-adaptive] step {done}: {lost} lost past "
                        f"limbo — rewinding window, limbocap={4 * lc}")
            carry = recap_sharded_dense(prev, cfg, mesh, nsc, cap, cap,
                                        limbocap_new=4 * lc, axis=axis)
            rewinds_here += 1
            continue
        if trouble > 0 and not ladder_ended and rewinds_here < 6:
            new_cap = escalate_cap(nsc, cap, max_cap)
            if new_cap is not None:
                if verbose:
                    verbose(f"[slab-adaptive] step {done}: {mask} capacity-"
                            f"masked + {limbo} limbo at cap={cap} — "
                            f"rewinding window, cap={new_cap}")
                carry = recap_sharded_dense(prev, cfg, mesh, nsc, cap,
                                            new_cap, axis=axis)
                cap = new_cap
                rewinds_here += 1
                continue
            ladder_ended = True
        if trouble > 0:
            # terminal rung: a window about to commit force-frozen
            # particles (ladder ended, or the rewind guard exhausted with
            # trouble remaining) is NEVER committed inexact under "exact"
            msg = (f"[slab-adaptive] step {done}: {mask} masked + {limbo} "
                   f"limbo at cap={cap} with no feasible escalation "
                   f"(cell_grid={nsc}"
                   + (", ladder ended" if ladder_ended
                      else ", rewind guard exhausted") + ")")
            if on_ladder_end == "raise":
                raise RuntimeError(msg)
            if exact_ok:
                enter_exact(prev, msg)
                continue
            if verbose:
                verbose(msg + " — committing the window; masked/limbo "
                        "particles are force-frozen, never wrong or lost")
        done += k
        rewinds_here = 0
        history.append((k, cap, trouble))
    if exact_mode:
        # the trajectory lives in the replicated live_state — materialize
        # it back into a valid stay-sharded carry. The scene may still be
        # denser than cap, so grow the limbo capacity until the rebuild
        # loses nothing (limbo rows are frozen only if STEPPED, and this
        # carry is a terminal return value).
        lc = carry[3].shape[0] // d
        while True:
            new_carry = build_sharded_dense(
                live_state, cfg.replace(cell_capacity=cap), mesh,
                nsc=nsc, cap=cap, mcap=mcap, limbocap=lc, axis=axis)
            if int(new_carry[4]) == 0:
                break
            lc *= 4
        carry = new_carry
    return carry, cap, history


@functools.partial(jax.jit, static_argnames=("axis", "mesh"))
def gather_sharded_dense(carry, state: ParticleState, mesh,
                         axis: str = AXIS) -> ParticleState:
    """Replicated particle-order state from a stay-sharded carry (particles
    never placed in a slot keep their values from ``state``)."""
    data, pid, limbo_data, limbo_pid, _ = carry

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(data, pid, limbo_data, limbo_pid, s):
        return _gather_state(data, pid, limbo_data, limbo_pid, s, axis)

    return run(data, pid, limbo_data, limbo_pid, state)
