"""Round-4 debug: per-step misplaced/served accounting at the 262k preset."""
import sys
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from particle3d_tpu.models import make_scene
from particle3d_tpu.engine.step import step, _dense_scan
from particle3d_tpu.ops.celllist_dense import (
    OCAP, build_dense, rebind, sidecar_indices, default_mover_capacity)

st, cfg, _ = make_scene("particle_life_large")
nsc, cap = cfg.cell_grid, cfg.cell_capacity
mcap = default_mover_capacity(st.n)
dt = 1.0 / 60.0

ds = build_dense(st, cfg, nsc, cap, OCAP)
s_total = ds.pid.shape[0]
mis = sidecar_indices(ds, OCAP)
print("build: parked", int(jnp.sum(jnp.logical_and(ds.pid >= 0, ds.r2 <= 0).astype(jnp.int32))),
      "dropped", int(st.n - jnp.sum((ds.pid >= 0).astype(jnp.int32))), flush=True)


@jax.jit
def one(ds, mis):
    ds2, (mov, mis_after) = _dense_scan(ds, cfg, dt, 1, nsc, cap, mcap,
                                        st.species.dtype, st.masses.dtype,
                                        ocap=OCAP, mis0=mis)
    return ds2, mov, mis_after


# re-derive the worklist each step outside the scan so we can inspect it
for i in range(64):
    ds2, (mov, frozen) = _dense_scan(ds, cfg, dt, 1, nsc, cap, mcap,
                                     st.species.dtype, st.masses.dtype,
                                     ocap=OCAP, mis0=mis)
    # recompute ground truth on the new layout
    n_mis_true = int(jnp.sum(jnp.logical_and(ds2.pid >= 0, ds2.r2 <= 0).astype(jnp.int32)))
    # what the NEXT step would serve: rebind's failed-mover list is inside the
    # scan; approximate by sidecar_indices ground truth
    truth_idx = sidecar_indices(ds2, 4096)
    n_truth = int(jnp.sum((truth_idx < s_total).astype(jnp.int32)))
    print(f"step {i}: movers {int(mov)} frozen_reported {int(frozen)} "
          f"misplaced_true {n_mis_true} (truth-list {n_truth})", flush=True)
    ds = ds2
    mis = sidecar_indices(ds, OCAP)
