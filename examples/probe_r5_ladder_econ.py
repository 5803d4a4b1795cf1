"""Round-5 probe: the bidirectional ladder's ECONOMIC win (round-4 verdict
weak item 4) — on a cluster-then-disperse scene, the adaptive driver's
wall time must beat the exact STATIC alternative.

Scenario: bench.py's re-probe scene (N=16k, zero attraction, a 96-row blob
with strong outward velocities; grid 16, cap 8, max_cap 32, ocap=0). The
static cell path is INFEASIBLE as an exact choice here (the blob masks at
every capacity <= max_cap), so the only exact static backend is the culled
sweep — the adaptive driver should beat it by serving the post-dispersal
windows on the (much faster) cell path.

Both arms run twice; the second (warmed — every program compiled) run is
the measurement. Run ON THE CHIP.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from particle3d_tpu import SimConfig, init_scene
from particle3d_tpu.engine.step import simulate_dense_adaptive, simulate_culled


def scene():
    cfg = SimConfig(world_size=16.0, neighbor="celllist_pallas",
                    cell_grid=16, cell_capacity=8,
                    attraction_matrix=np.zeros((5, 5), np.float32)).validate()
    st = init_scene(jax.random.PRNGKey(9), 16384, cfg)
    rng = np.random.default_rng(11)
    crowd = 96
    pos = np.asarray(st.positions).copy()
    vel = np.asarray(st.velocities).copy()
    dirs = rng.normal(size=(crowd, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pos[:crowd] = np.float32([1.0, 1.0, 1.0]) + dirs * 0.05
    vel[:crowd] = dirs * 8.0
    return st.replace(positions=jnp.asarray(pos),
                      velocities=jnp.asarray(vel)), cfg


def main():
    dt = 1.0 / 30.0
    for rep in ("warm", "timed"):
        st, cfg = scene()
        t0 = time.perf_counter()
        _, _, hist = simulate_dense_adaptive(st, cfg, dt, 48, chunk=4,
                                             max_cap=32, ocap=0)
        wall_a = time.perf_counter() - t0
        assert all(m == 0 for _, _, m in hist)
        st, cfg = scene()
        t0 = time.perf_counter()
        out, stats = simulate_culled(st, cfg, dt, 48, window=4)
        jax.block_until_ready(out.positions)
        wall_c = time.perf_counter() - t0
        print(f"[{rep}] adaptive ladder {wall_a:.2f} s "
              f"(windows {[c for _, c, _ in hist]}) vs static culled "
              f"{wall_c:.2f} s -> ladder "
              f"{'WINS' if wall_a < wall_c else 'loses'} "
              f"({wall_c / wall_a:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
