#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: pair-interactions/sec of the tiled Pallas all-pairs force kernel
inside the full fused simulation step at N=262,144 (BASELINE.json config 3
scale). vs_baseline measures against the 1e11 pairs/s target from
BASELINE.json (set for a v5p chip; this harness reports whatever chip JAX
finds — the driver's env has a single v5e).

Timing methodology: every measured call ends in a host-forced scalar
reduction (float(sum(...))) because on the axon remote-execution platform
``block_until_ready`` can return at enqueue time; a data dependency to host
is the only reliable fence. Warmup uses identical static shapes so
compilation is excluded.

Extra context (steps/sec at N=4k/262k, LJ cell-list steps/sec) goes to
stderr so stdout stays a single JSON line.
"""

import json
import sys
import time


def _timed(fn, iters):
    """Seconds per call, excluding compile, with a host-forced fence."""
    import jax.numpy as jnp

    float(jnp.sum(fn()))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.sum(fn()))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the pairlist/scan kernels cost minutes
    # of Mosaic compile over the remote tunnel; cache survives across bench
    # runs (and rounds) in the repo tree
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from particle3d_tpu import reference_config, init_scene, simulate, warmup
    from particle3d_tpu.models import make_scene

    # Backend init probes the axon tunnel; when the tunnel is DOWN the
    # connect-retry loop hangs forever (observed 20+ min, round 4) — and it
    # would hang INSIDE jax's backend-init lock, so an in-process timeout
    # can't recover. Probe the tunnel in a SUBPROCESS with a hard timeout
    # and fall back to CPU before this process ever touches the backend,
    # so the harness always emits its JSON line.
    if jax.config.jax_platforms not in ("cpu",):
        import subprocess

        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=240, check=True, capture_output=True)
        except Exception as e:
            print(f"[bench] TPU backend probe failed ({type(e).__name__}) — "
                  f"tunnel down? forcing CPU fallback", file=sys.stderr)
            jax.config.update("jax_platforms", "cpu")
    dev = jax.devices()[0]
    backend = jax.default_backend()
    print(f"[bench] backend={backend} device={dev.device_kind}", file=sys.stderr)

    on_tpu = dev.platform == "tpu"
    neighbor = "allpairs_pallas" if on_tpu else "allpairs"
    dt = 1.0 / 60.0

    # --- raw brute-force kernel rate: N=262k tiled Pallas all-pairs -------
    n = 262144 if on_tpu else 4096  # CPU fallback keeps the harness runnable
    cfg = reference_config(world_size=40.0).replace(neighbor=neighbor)
    st = init_scene(jax.random.PRNGKey(0), n, cfg)

    steps = 5 if on_tpu else 2
    sec = _timed(lambda: simulate(st, cfg, dt, steps).positions, 3 if on_tpu else 1)
    steps_per_s = steps / sec
    pairs_per_s = float(n) * float(n) * steps_per_s
    print(f"[bench] N={n} brute-force all-pairs kernel: {steps_per_s:.3f} "
          f"steps/s = {pairs_per_s:.3e} pair-interactions/s", file=sys.stderr)

    # --- headline: the measured BRUTE-FORCE kernel rate. The cell-list
    # path's "effective" N^2 rate counts pairs the cell list never computes,
    # so it goes under its own key (extra) with its own semantics, not into
    # vs_baseline (whose 1e11 target is defined for actual pair evaluations).
    headline_pairs_per_s = pairs_per_s
    headline_name = ("pair_interactions_per_sec_allpairs_N262k" if on_tpu
                     else "pair_interactions_per_sec_allpairs_smallN_cpu_fallback")
    extra = {"allpairs_steps_per_s_N262k": steps_per_s}
    if on_tpu:
        # particle-life particles move fast (drift > cell slack), so the
        # exact configuration keeps the layout fresh every step — via the
        # incrementally-maintained dense layout (bit-equal to a per-step
        # full rebuild, ~2.5x faster; ops/celllist_dense.py)
        from particle3d_tpu.engine.step import simulate_dense

        stc, cfgc, dtc = make_scene("particle_life_large")
        secc = _timed(
            lambda: simulate_dense(stc, cfgc, dt, 16)[0].positions, 2)
        _, (mx_mov, mx_mis) = simulate_dense(stc, cfgc, dt, 16)
        assert int(mx_mis) == 0, (
            f"262k production window must be exact: {int(mx_mis)} masked")
        eff = float(n) * float(n) * (16 / secc)
        print(f"[bench] N={n} particle-life, pallas cell list (production "
              f"path, incremental per-step relayout — exact): "
              f"{16 / secc:.2f} steps/s = {eff:.3e} effective "
              f"pair-interactions/s (max movers/step {int(mx_mov)}, "
              f"capacity-masked {int(mx_mis)})", file=sys.stderr)
        extra["celllist_steps_per_s_N262k_exact"] = 16 / secc
        extra["effective_pair_interactions_per_sec_N262k_celllist"] = eff

        # --- 1M preset, fenced (round-3 verdict item 3: every headline
        # number must be regression-gated by an artifact). This scene
        # leaves its uniform phase within ~2 windows (capacity masking
        # appears between steps 16 and 32 at the preset geometry — the
        # exactness horizon, docs/PERF.md round 4), so the steady-state
        # production rate is the EXACT-WINDOW MARGINAL: the slope between
        # window-8 and window-16 from init, both asserted exact. The
        # one-time build + scatter_back cancel in the difference; the
        # all-in window-16 (incl. them) goes under its own key. ----------
        try:
            st1, cfg1, _ = make_scene("particle_life_1m")
            sec8 = _timed(
                lambda: simulate_dense(st1, cfg1, dt, 8)[0].positions, 2)
            sec16 = _timed(
                lambda: simulate_dense(st1, cfg1, dt, 16)[0].positions, 2)
            for k in (8, 16):
                _, (_, mis1m) = simulate_dense(st1, cfg1, dt, k)
                assert int(mis1m) == 0, (
                    f"1M window-{k} must be exact: {int(mis1m)} masked")
            slope1m = (sec16 - sec8) / 8
            print(f"[bench] N=1,048,576 particle-life production path: "
                  f"{1 / slope1m:.2f} steps/s steady-state (exact-window "
                  f"marginal, {slope1m * 1e3:.1f} ms/step), window-16 "
                  f"all-in {16 / sec16:.2f} steps/s, masked 0",
                  file=sys.stderr)
            extra["steps_per_s_N1M"] = 1 / slope1m
            extra["steps_per_s_N1M_window16"] = 16 / sec16

            # --- 1M LONG-HORIZON regime (round-5 verdict item 3): the
            # preset's exactness horizon is < 32 steps, so "longer runs
            # belong to the adaptive ladder" — priced here for the first
            # time. 48 steps from init (chunk 16) CROSS the horizon; the
            # driver must escalate/switch as needed and commit only exact
            # windows. Plus the culled fallback's own end-to-end rate at
            # 1M (the rung the ladder ends on — previously priced only at
            # 262k). ---------------------------------------------------
            from particle3d_tpu.engine.step import (
                simulate_dense_adaptive, simulate_culled)

            # warmed-second-rep protocol (probe_r5_ladder_econ): the first
            # run compiles whatever escalation rungs the service cache is
            # missing — observed 54.9 s cold vs ~10 s warm for the SAME
            # committed windows — so the recorded key is the second,
            # compile-free rep; the cold wall goes to stderr only.
            t0 = time.perf_counter()
            _, cap1m, hist1m = simulate_dense_adaptive(
                st1, cfg1, dt, 48, chunk=16)
            cold1m = time.perf_counter() - t0
            assert all(m == 0 for _, _, m in hist1m), (
                f"1M ladder committed an inexact window: {hist1m}")
            t0 = time.perf_counter()
            _, cap1m, hist1m = simulate_dense_adaptive(
                st1, cfg1, dt, 48, chunk=16)
            wall1m = time.perf_counter() - t0
            assert all(m == 0 for _, _, m in hist1m), (
                f"1M ladder committed an inexact window: {hist1m}")
            print(f"[bench] 1M adaptive ladder (48 steps from init, chunk "
                  f"16, crosses the exactness horizon): {wall1m:.1f} s "
                  f"wall warm ({cold1m:.1f} s incl. one-time escalation "
                  f"compiles), end cap {cap1m}, windows "
                  f"{[c for _, c, _ in hist1m]}, every committed window "
                  f"exact", file=sys.stderr)
            extra["ladder_1m_48steps_wall_s"] = wall1m
            extra["ladder_1m_committed_inexact"] = 0

            out8m, stats8m = simulate_culled(st1, cfg1, dt, 8, window=8)
            float(jnp.sum(out8m.positions))  # fence + warm exact program
            t0 = time.perf_counter()
            out8m2, stats8m2 = simulate_culled(st1, cfg1, dt, 8, window=8,
                                               wp_cap=stats8m["wp_cap"])
            float(jnp.sum(out8m2.positions))
            secw1m = (time.perf_counter() - t0) / 8
            print(f"[bench] worklist-culled fallback at 1M "
                  f"(simulate_culled, 8 steps): {secw1m*1e3:.0f} ms/step "
                  f"all-in ({1/secw1m:.2f} steps/s), mean pair frac "
                  f"{stats8m2['mean_pair_frac']:.3f}", file=sys.stderr)
            extra["simulate_culled_ms_per_step_N1M"] = secw1m * 1e3
        except Exception as e:
            print(f"[bench] 1M preset bench failed: {e}", file=sys.stderr)
            extra["n1m_error"] = str(e)[:200]

        # --- cost-aware escalation ladder, fenced (verdict item 3): a
        # short clustering run through simulate_dense_adaptive must commit
        # ONLY exact windows while the ladder (sidecar -> escalate ->
        # culled probe) manages capacity. -------------------------------
        try:
            from particle3d_tpu.engine.step import simulate_dense_adaptive

            # warmed-second-rep (see the 1M ladder above): round 4 recorded
            # 6.12 s here with a lucky-warm service cache; a cold cache
            # inflates the same run to 17.2 s of compile time
            _, cap_end, hist = simulate_dense_adaptive(
                stc, cfgc, dt, 64, chunk=16)
            assert all(m == 0 for _, _, m in hist), (
                f"adaptive ladder committed an inexact window: {hist}")
            t0 = time.perf_counter()
            _, cap_end, hist = simulate_dense_adaptive(
                stc, cfgc, dt, 64, chunk=16)
            wall = time.perf_counter() - t0
            assert all(m == 0 for _, _, m in hist), (
                f"adaptive ladder committed an inexact window: {hist}")
            backends = [c for _, c, _ in hist]
            print(f"[bench] adaptive ladder (N=262k, 64 steps, chunk 16): "
                  f"{wall:.1f} s wall warm, end cap {cap_end}, windows "
                  f"{backends}, every committed window exact",
                  file=sys.stderr)
            extra["ladder_64steps_wall_s"] = wall
            extra["ladder_committed_inexact"] = 0
        except Exception as e:
            print(f"[bench] adaptive ladder bench failed: {e}",
                  file=sys.stderr)
            extra["ladder_error"] = str(e)[:200]

        # --- bidirectional re-probe ON HARDWARE (round-5 verdict item 8):
        # the 64-step ladder above never leaves the cell path, so the
        # culled fallback and the switch-BACK re-probe had zero on-chip
        # coverage. Engineered cluster-then-disperse at N=16k: a blob
        # denser than max_cap forces the culled backend; strong outward
        # velocities disperse it ballistically; the dispersal re-probe
        # must return to the cell path — asserted from history, with real
        # wall-clock driving the cost decisions. ocap=0 so the blob
        # actually masks (the sidecar would serve it). -------------------
        try:
            from particle3d_tpu import SimConfig
            from particle3d_tpu.engine.step import simulate_dense_adaptive
            import numpy as np

            # mean occupancy must sit FAR below max_cap or the probe can
            # never succeed: the first run used N=32k on this grid (mean
            # 8/cell) with max_cap 16, and the background's own Poisson
            # tail kept masking every re-probe — N=16k (mean 4) with
            # max_cap 32 leaves the background orders of magnitude clear
            n_rp = 16384
            cfg_rp = SimConfig(
                world_size=16.0, neighbor="celllist_pallas", cell_grid=16,
                cell_capacity=8,
                attraction_matrix=np.zeros((5, 5), np.float32)).validate()
            st_rp = init_scene(jax.random.PRNGKey(9), n_rp, cfg_rp)
            rngr = np.random.default_rng(11)
            crowd = 96
            pos_rp = np.asarray(st_rp.positions).copy()
            vel_rp = np.asarray(st_rp.velocities).copy()
            dirs = rngr.normal(size=(crowd, 3)).astype(np.float32)
            dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
            pos_rp[:crowd] = np.float32([1.0, 1.0, 1.0]) + dirs * 0.05
            vel_rp[:crowd] = dirs * 8.0
            st_rp = st_rp.replace(positions=jnp.asarray(pos_rp),
                                  velocities=jnp.asarray(vel_rp))
            # warmed-second-rep (see the 1M ladder above; probe_r5_ladder
            # _econ measured this scenario's shape 21.8 s cold vs 0.69 warm
            # at N=16k — the cold wall is compile, not physics)
            _, _, hist_rp = simulate_dense_adaptive(
                st_rp, cfg_rp, 1.0 / 30.0, 48, chunk=4, max_cap=32, ocap=0)
            assert all(m == 0 for _, _, m in hist_rp), (
                f"re-probe scenario committed an inexact window: {hist_rp}")
            t0 = time.perf_counter()
            _, _, hist_rp = simulate_dense_adaptive(
                st_rp, cfg_rp, 1.0 / 30.0, 48, chunk=4, max_cap=32, ocap=0)
            wall_rp = time.perf_counter() - t0
            backends = [c for _, c, _ in hist_rp]
            assert all(m == 0 for _, _, m in hist_rp), (
                f"re-probe scenario committed an inexact window: {hist_rp}")
            assert "allpairs" in backends, (
                f"blob never forced the culled backend: {hist_rp}")
            i_cul = backends.index("allpairs")
            assert any(b != "allpairs" for b in backends[i_cul:]), (
                f"dispersal re-probe never returned to the cell path: "
                f"{hist_rp}")
            print(f"[bench] bidirectional re-probe on-chip (N=16k blob "
                  f"cluster->disperse, 48 steps): windows {backends}, "
                  f"culled AND a later cell window both executed on "
                  f"hardware, every window exact, {wall_rp:.1f} s wall",
                  file=sys.stderr)
            extra["reprobe_culled_then_cell_onchip"] = 1
            extra["reprobe_scenario_wall_s"] = wall_rp
        except Exception as e:
            print(f"[bench] re-probe scenario failed: {e}", file=sys.stderr)
            extra["reprobe_error"] = str(e)[:200]

        # --- on-TPU cross-backend equivalence: the production cell kernel
        # must reproduce the triangular all-pairs forces in COMPILED mode
        # (CI only exercises interpret mode) -----------------------------
        from particle3d_tpu.ops import forces as FF
        from particle3d_tpu.ops.pallas_allpairs import pallas_allpairs_forces_tri
        from particle3d_tpu.ops.pallas_celllist import pallas_celllist_forces
        import numpy as np

        u, v = FF.pair_features(stc, cfgc)
        f_cell = np.asarray(pallas_celllist_forces(
            stc.positions, u, v, cfgc))
        f_tri = np.asarray(pallas_allpairs_forces_tri(
            stc.positions, u, v, cfgc))
        scale = max(1e-6, float(np.max(np.abs(f_tri))))
        rel = float(np.max(np.abs(f_cell - f_tri))) / scale
        print(f"[bench] on-TPU equivalence celllist_pallas vs triangular "
              f"all-pairs (N={n}, 1 force sweep): max rel err {rel:.2e}",
              file=sys.stderr)
        assert rel < 5e-5, (
            f"compiled-mode backend mismatch: celllist_pallas vs triangular "
            f"all-pairs rel err {rel:.2e}")
        extra["celllist_vs_allpairs_rel_err"] = rel

        # culled all-pairs (the adaptive driver's fallback backend): same
        # compiled-mode equivalence gate + its measured rate
        from particle3d_tpu.ops.pallas_allpairs import (
            pallas_allpairs_forces_culled)

        f_culled, frac = pallas_allpairs_forces_culled(
            stc.positions, u, v, cfgc, with_stats=True)
        relc = float(np.max(np.abs(np.asarray(f_culled) - f_tri))) / scale
        secq = _timed(lambda: pallas_allpairs_forces_culled(
            stc.positions, u, v, cfgc), 3)
        print(f"[bench] culled all-pairs (N={n}): {secq*1e3:.0f} ms/sweep, "
              f"surviving tile-pair frac {float(frac):.3f}, max rel err "
              f"vs triangular {relc:.2e}", file=sys.stderr)
        assert relc < 5e-5, (
            f"compiled-mode backend mismatch: allpairs_culled vs triangular "
            f"rel err {relc:.2e}")
        extra["culled_sweep_ms_N262k"] = secq * 1e3
        extra["culled_vs_allpairs_rel_err"] = relc

        # worklist-culled fallback driver (simulate_culled): compiled-mode
        # equivalence vs the exact dense path + its steady windowed rate —
        # the terminal rung of the capacity-escalation ladder
        try:
            from particle3d_tpu.engine.step import (
                simulate_dense, simulate_culled)

            ref8, _ = simulate_dense(stc, cfgc, dt, 8)
            out8, stats8 = simulate_culled(stc, cfgc, dt, 8, window=8)
            sc = max(1.0, float(np.max(np.abs(np.asarray(ref8.positions)))))
            relw = float(np.max(np.abs(
                np.asarray(out8.positions)
                - np.asarray(ref8.positions)))) / sc
            assert relw < 5e-5, (
                f"compiled-mode mismatch: simulate_culled vs simulate_dense "
                f"rel err {relw:.2e}")
            assert stats8["retries"] == 0 or stats8["max_count"] > 0
            # warm the EXACT timed program first: a 16-step call is a
            # different program from the 8-step warmup above, and its
            # Mosaic compile (measured: ~16 s uncached) would otherwise
            # land inside the timed region (same rule the slab bench
            # follows); threading wp_cap skips the learn-by-rewind cycle
            out16, stats16 = simulate_culled(out8, cfgc, dt, 16, window=8,
                                             wp_cap=stats8["wp_cap"])
            float(jnp.sum(out16.positions))
            t0 = time.perf_counter()
            out16, stats16 = simulate_culled(out8, cfgc, dt, 16, window=8,
                                             wp_cap=stats16["wp_cap"])
            float(jnp.sum(out16.positions))
            secw = (time.perf_counter() - t0) / 16
            print(f"[bench] worklist-culled fallback (simulate_culled, "
                  f"N={n}): {secw*1e3:.0f} ms/step all-in "
                  f"({1/secw:.2f} steps/s), mean pair frac "
                  f"{stats16['mean_pair_frac']:.3f}, rel err vs dense path "
                  f"{relw:.2e}", file=sys.stderr)
            extra["simulate_culled_ms_per_step_N262k"] = secw * 1e3
            extra["simulate_culled_vs_dense_rel_err"] = relw
        except Exception as e:
            print(f"[bench] simulate_culled bench failed: {e}",
                  file=sys.stderr)

        # --- compiled-mode gates for the SHARDED kernels (round-3 item 1):
        # a 1-device mesh on the real chip compiles + runs the slab path's
        # halo=True column kernel and the ring ppermute sweep — the exact
        # blind-spot class that hid the round-1 revisit bug ---------------
        try:
            from particle3d_tpu.parallel import (
                make_mesh, shard_state, sharded_simulate,
                sharded_dense_simulate)
            from particle3d_tpu.engine.step import simulate_dense

            # The gates run at the PRESET geometry (24, 32) — the round-4
            # mean-hugging tune that overflows ~60 rows. Round 4 had to
            # retreat to a tail-covering (28, 32) here because the slab
            # path froze overflow in limbo (rel err 1.22e-03 was frozen
            # rows, not kernel error); round 5 ported the overflow sidecar
            # to the slab path (parallel/domain_sharded.py), so both paths
            # now serve overflow EXACTLY and the gate asserts exactly that:
            # unserved == 0 on both sides at the production geometry, any
            # residual is the kernel. 4 steps (verified by the asserts
            # below).
            g_nsc, g_cap = cfgc.cell_grid, cfgc.cell_capacity
            mesh1 = make_mesh(1)
            out_slab, (_, mask_s, limbo_s, lost, _) = sharded_dense_simulate(
                stc, cfgc, dt, 4, mesh1, nsc=g_nsc, cap=g_cap)
            ref4, (_, mis4) = simulate_dense(stc, cfgc, dt, 4,
                                             nsc=g_nsc, cap=g_cap)
            sc = max(1.0, float(np.max(np.abs(np.asarray(ref4.positions)))))
            rel_slab = float(np.max(np.abs(
                np.asarray(out_slab.positions)
                - np.asarray(ref4.positions)))) / sc
            assert int(lost) == 0
            assert int(mask_s) == 0 and int(limbo_s) == 0 and int(mis4) == 0, (
                f"slab gate must be exact (sidecar serves overflow): slab "
                f"unserved masked {int(mask_s)} limbo {int(limbo_s)} dense "
                f"masked {int(mis4)}")
            assert rel_slab < 5e-5, (
                f"compiled-mode mismatch: slab halo kernel + sidecar vs "
                f"dense layout rel err {rel_slab:.2e}")
            print(f"[bench] slab halo kernel + overflow sidecar compiled "
                  f"on-chip (1-dev mesh, N={n}, 4 steps, production "
                  f"({g_nsc},{g_cap})): rel err vs simulate_dense "
                  f"{rel_slab:.2e}, unserved 0, lost 0",
                  file=sys.stderr)
            extra["slab_halo_vs_dense_rel_err"] = rel_slab

            # walled variant of the halo kernel (dead ghosts + dummy-column
            # y map + edge-killed halo planes) — a distinct compiled program
            # that only interpret mode exercised before this gate
            cfgw = cfgc.replace(boundary="clamp", wrap_forces=False)
            out_w, (_, mask_w, limbo_w, lost_w, _) = sharded_dense_simulate(
                stc, cfgw, dt, 4, mesh1, nsc=g_nsc, cap=g_cap)
            refw, (_, misw) = simulate_dense(stc, cfgw, dt, 4,
                                             nsc=g_nsc, cap=g_cap)
            scw = max(1.0, float(np.max(np.abs(np.asarray(refw.positions)))))
            rel_wall = float(np.max(np.abs(
                np.asarray(out_w.positions)
                - np.asarray(refw.positions)))) / scw
            assert int(lost_w) == 0
            assert int(mask_w) == 0 and int(limbo_w) == 0 and int(misw) == 0, (
                f"walled slab gate must be exact: slab unserved masked "
                f"{int(mask_w)} limbo {int(limbo_w)} dense masked {int(misw)}")
            assert rel_wall < 5e-5, (
                f"compiled-mode mismatch: WALLED slab halo kernel vs dense "
                f"layout rel err {rel_wall:.2e}")
            print(f"[bench] walled slab halo kernel compiled on-chip "
                  f"(1-dev mesh, N={n}, 4 steps): rel err vs simulate_dense "
                  f"{rel_wall:.2e}, lost 0", file=sys.stderr)
            extra["slab_walls_vs_dense_rel_err"] = rel_wall

            # reference FIRST: _sharded_simulate donates its input, and on a
            # 1-device mesh shard_state's device_put aliases st's buffer —
            # donation would delete st out from under simulate()
            ref_ring = simulate(st, cfg, dt, 2)
            ring_state = shard_state(jax.tree.map(jnp.copy, st), mesh1)
            out_ring = sharded_simulate(ring_state, cfg, dt, 2, mesh1)
            sc = max(1.0, float(np.max(np.abs(
                np.asarray(ref_ring.positions)))))
            rel_ring = float(np.max(np.abs(
                np.asarray(out_ring.positions)
                - np.asarray(ref_ring.positions)))) / sc
            assert rel_ring < 5e-5, (
                f"compiled-mode mismatch: ring sweep vs all-pairs "
                f"rel err {rel_ring:.2e}")
            print(f"[bench] ring sweep compiled on-chip (1-dev mesh, N={n}, "
                  f"2 steps): rel err vs all-pairs {rel_ring:.2e}",
                  file=sys.stderr)
            extra["ring_vs_allpairs_rel_err"] = rel_ring

            # sharded EXACT terminal rung compiled on-chip (round 5): the
            # compacted masked-ring window (sharded_exact_steps — the
            # de-replicated ladder end) must reproduce plain all-pairs.
            # Same interpret-mode blind-spot class as the other gates;
            # the 8-device CPU dryrun/tests cover the mesh behavior, this
            # covers the compiled program.
            from particle3d_tpu.parallel.domain_sharded import (
                build_sharded_dense, sharded_exact_steps,
                gather_sharded_dense)

            carry_x = build_sharded_dense(stc, cfgc, mesh1)
            carry_x, ovf_x = sharded_exact_steps(carry_x, cfgc, dt, 2,
                                                 mesh1, rcap=n)
            assert int(ovf_x) == 0
            out_x = gather_sharded_dense(carry_x, stc, mesh1)
            ref_x = simulate(stc, cfgc.replace(neighbor="allpairs_pallas"),
                             dt, 2)
            scx = max(1.0, float(np.max(np.abs(np.asarray(
                ref_x.positions)))))
            rel_x = float(np.max(np.abs(
                np.asarray(out_x.positions)
                - np.asarray(ref_x.positions)))) / scx
            assert rel_x < 5e-5, (
                f"compiled-mode mismatch: sharded exact rung vs all-pairs "
                f"rel err {rel_x:.2e}")
            print(f"[bench] sharded exact terminal rung compiled on-chip "
                  f"(1-dev mesh, N={n}, 2 steps, compacted masked ring): "
                  f"rel err vs all-pairs {rel_x:.2e}, overflow 0",
                  file=sys.stderr)
            extra["sharded_exact_rung_vs_allpairs_rel_err"] = rel_x
        except Exception as e:
            print(f"[bench] sharded compiled gates failed: {e}",
                  file=sys.stderr)
            extra["sharded_gates_error"] = str(e)[:200]

        # --- BASELINE config-5 direction: stay-sharded slab carry at N=2M
        # on the real chip — steps/s + live per-chip HBM accounting -------
        try:
            from particle3d_tpu.parallel import (
                make_mesh, init_sharded_dense, sharded_dense_steps)
            from particle3d_tpu import SimConfig

            n2m = 2_097_152
            # measured geometry sweep (docs/PERF.md "Slab carry at 2M" +
            # round 5 "The 2M slab retune"): coarse 44^3 grid (cell width
            # 1.45) + cap 64 covers the tail through step 20 — the
            # mean-hugging (48,40)+sidecar alternative measured exact but
            # SLOWER (5.74 vs 6.3 steps/s), so the tail-covering geometry
            # stays and the sidecar is off here (ocap=0: the trouble
            # assert below then genuinely means zero overflow existed).
            # Static-bound right-sizing (round 5): mcap = 2.25x the
            # observed ~51k movers/step (the half rung at 57k carries
            # them), and migcap = 4096 on a 1-device mesh (there are NO
            # slab crossers; the old mcap/2 default dragged 131k dead
            # inbox rows through pass B's sorts/gathers every step —
            # measured 196 -> 158 ms/step, probe_r5_slab2m).
            nsc2, cap2, mcap2, migcap2 = 44, 64, 114688, 4096
            cfg2m = SimConfig(world_size=64.0,
                              neighbor="celllist_pallas", cell_grid=nsc2,
                              cell_capacity=cap2).validate()
            mesh1 = make_mesh(1)
            carry = init_sharded_dense(jax.random.PRNGKey(5), n2m, cfg2m,
                                       mesh1, nsc=nsc2, cap=cap2,
                                       migcap=migcap2)
            hbm = sum(int(a.nbytes) for a in jax.tree.leaves(carry))
            carry, _ = sharded_dense_steps(   # compile + warm — SAME
                carry, cfg2m, dt, 10, mesh1, nsc=nsc2, cap=cap2,
                mcap=mcap2, migcap=migcap2, n=n2m, ocap=0)
            # num_steps as the timed call: a different step count is a
            # different program, and its Mosaic compile (minutes over the
            # remote tunnel) would land inside the timed region
            float(jnp.sum(carry[0][:, 0]))
            t0 = time.perf_counter()
            carry, (mov2, mask2, limbo2, lost2, _) = sharded_dense_steps(
                carry, cfg2m, dt, 10, mesh1, nsc=nsc2, cap=cap2,
                mcap=mcap2, migcap=migcap2, n=n2m, ocap=0)
            float(jnp.sum(carry[0][:, 0]))
            sec2m = (time.perf_counter() - t0) / 10
            dev_stats = jax.devices()[0].memory_stats() or {}
            used = dev_stats.get("bytes_in_use", 0)
            trouble2m = int(mask2) + int(limbo2)
            assert trouble2m == 0, (
                f"slab 2M window committed force-frozen particles: "
                f"masked {int(mask2)} limbo {int(limbo2)}")
            print(f"[bench] slab stay-sharded N=2M (1 chip): "
                  f"{1/sec2m:.2f} steps/s, carry {hbm/1e9:.2f} GB, device "
                  f"in-use {used/1e9:.2f} GB, masked {int(mask2)} "
                  f"limbo {int(limbo2)} lost {int(lost2)}", file=sys.stderr)
            extra["slab_steps_per_s_N2M"] = 1 / sec2m
            extra["slab_carry_bytes_N2M"] = hbm
            extra["slab_lost_N2M"] = int(lost2)
            extra["slab_trouble_N2M"] = trouble2m
        except Exception as e:
            print(f"[bench] slab 2M bench failed: {e}", file=sys.stderr)
            extra["slab_2m_error"] = str(e)[:200]

        # --- N=8M on ONE chip, exact (round 5): same 8 particles/unit^3
        # density as the 2M flagship (world 100), tail-covering (68, 64)
        # with the round-5 SLAB SIDECAR serving the marginal tail — pure
        # capacity masks 16 rows by step 20 where ocap=128 serves them
        # exactly for ~41 ms/step of enable cost, cheaper than the (72,64)
        # slot padding (+19% slots; examples/probe_r5_slab8m.py). mcap =
        # 2.25x the observed ~186k movers, migcap=4096 (1-device mesh,
        # no crossers). Round 3's 8M was a hot-gas capacity experiment
        # with thousands masked; this is a production point: trouble == 0
        # asserted. -------------------------------------------------------
        try:
            from particle3d_tpu.parallel import (
                make_mesh, init_sharded_dense, sharded_dense_steps)
            from particle3d_tpu import SimConfig

            n8m = 8 * 1024 * 1024
            nsc8, cap8, mcap8, migcap8 = 68, 64, 419840, 4096
            cfg8m = SimConfig(world_size=100.0,
                              neighbor="celllist_pallas", cell_grid=nsc8,
                              cell_capacity=cap8).validate()
            mesh1 = make_mesh(1)
            carry8 = init_sharded_dense(jax.random.PRNGKey(5), n8m, cfg8m,
                                        mesh1, nsc=nsc8, cap=cap8,
                                        migcap=migcap8)
            hbm8 = sum(int(a.nbytes) for a in jax.tree.leaves(carry8))
            kw8 = dict(nsc=nsc8, cap=cap8, mcap=mcap8, migcap=migcap8,
                       n=n8m, ocap=128)
            carry8, _ = sharded_dense_steps(  # compile + warm, same shape
                carry8, cfg8m, dt, 10, mesh1, **kw8)
            float(jnp.sum(carry8[0][:, 0]))
            t0 = time.perf_counter()
            carry8, (mov8, mask8, limbo8, lost8, _) = sharded_dense_steps(
                carry8, cfg8m, dt, 10, mesh1, **kw8)
            float(jnp.sum(carry8[0][:, 0]))
            sec8m = (time.perf_counter() - t0) / 10
            trouble8m = int(mask8) + int(limbo8)
            assert trouble8m == 0 and int(lost8) == 0, (
                f"slab 8M window committed force-frozen particles: "
                f"masked {int(mask8)} limbo {int(limbo8)} lost {int(lost8)}")
            print(f"[bench] slab stay-sharded N=8M (1 chip, sidecar-served "
                  f"tail): {1/sec8m:.2f} steps/s, carry {hbm8/1e9:.2f} GB, "
                  f"masked {int(mask8)} limbo {int(limbo8)} "
                  f"lost {int(lost8)}", file=sys.stderr)
            extra["slab_steps_per_s_N8M"] = 1 / sec8m
            extra["slab_carry_bytes_N8M"] = hbm8
            extra["slab_trouble_N8M"] = trouble8m
        except Exception as e:
            print(f"[bench] slab 8M bench failed: {e}", file=sys.stderr)
            extra["slab_8m_error"] = str(e)[:200]

    if on_tpu:
        # --- N=4096 steps/sec (reference demo scale, x4). Parsed key
        # (round-5 verdict item 5): the round-4 3,065 -> 2,824 regression
        # was stderr-only and invisible to artifact diffs. -----------------
        cfg2 = reference_config().replace(neighbor=neighbor)
        st2 = init_scene(jax.random.PRNGKey(1), 4096, cfg2)
        sec2 = _timed(lambda: simulate(st2, cfg2, dt, 200).positions, 2)
        print(f"[bench] N=4096 all-pairs: {200 / sec2:.1f} steps/s",
              file=sys.stderr)
        extra["allpairs_steps_per_s_N4k"] = 200 / sec2

        # --- N=262k LJ gas: Pallas cell-list kernel, cadenced rebuild -----
        try:
            from particle3d_tpu.engine.step import simulate_cadenced

            st3, cfg3, dt3 = make_scene("lj_gas")
            st3 = warmup(st3, cfg3)
            sec3 = _timed(
                lambda: simulate_cadenced(st3, cfg3, dt3, 32,
                                          rebuild_every=16)[0].positions, 2)
            print(f"[bench] N=262144 LJ cell-list: {32 / sec3:.2f} steps/s",
                  file=sys.stderr)
        except Exception as e:  # keep the headline metric alive regardless
            print(f"[bench] LJ cell-list bench failed: {e}", file=sys.stderr)

    # --- trajectory parity vs the reference-exact native engine ----------
    try:
        import numpy as np

        from particle3d_tpu import native

        if native.available():
            cfgp = reference_config()
            stp = init_scene(jax.random.PRNGKey(7), 1000, cfgp)
            pos0 = np.asarray(stp.positions)
            vel0 = np.asarray(stp.velocities)
            spec0 = np.asarray(stp.species)
            steps_p = 120
            outp = simulate(stp, cfgp, dt, steps_p)
            ref_pos, _ = native.native_simulate(
                pos0, vel0, spec0, cfgp, dt, steps_p)
            l2 = float(np.sqrt(np.mean(
                (np.asarray(outp.positions) - ref_pos) ** 2)))
            print(f"[bench] trajectory L2 vs reference-exact native engine "
                  f"(N=1000, {steps_p} steps): {l2:.2e}", file=sys.stderr)
            extra["trajectory_l2_vs_native_N1k_120steps"] = l2
    except Exception as e:
        print(f"[bench] parity check skipped: {e}", file=sys.stderr)

    baseline = 1e11  # BASELINE.json: >=1e11 pair-interactions/s target
    print(json.dumps({
        "metric": headline_name,
        "value": headline_pairs_per_s,
        "unit": "pairs/s",
        "vs_baseline": headline_pairs_per_s / baseline,
        **extra,
    }))


if __name__ == "__main__":
    main()
