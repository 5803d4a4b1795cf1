"""Round-5 probe: attribute the two round-4 bench regressions (VERDICT r4
item 5) — N=4k all-pairs 3,065 -> 2,824 steps/s and culled_sweep_ms_N262k
259 -> 287 ms.

Neither code path changed in round 4 (`git log` over ops/pallas_allpairs.py
is round-3-only; the N=4k path runs reference_config + allpairs_pallas,
untouched), so the hypothesis is environment variance across rounds (the
axon tunnel service / host load — methodology pitfall 3). This probe
measures each metric REPEATEDLY in one session to establish the
within-session band, to be compared against the r03/r04 artifact values
(3,065 / 259 vs 2,824 / 287).

Run ON THE CHIP: python examples/probe_r5_regressions.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from particle3d_tpu import reference_config, init_scene, simulate
from particle3d_tpu.models import make_scene
from particle3d_tpu.ops import forces as FF
from particle3d_tpu.ops.pallas_allpairs import pallas_allpairs_forces_culled

REPS = 6


def main():
    dt = 1.0 / 60.0
    # N=4k all-pairs, exactly bench.py's protocol
    cfg2 = reference_config().replace(neighbor="allpairs_pallas")
    st2 = init_scene(jax.random.PRNGKey(1), 4096, cfg2)
    float(jnp.sum(simulate(st2, cfg2, dt, 200).positions))  # compile+warm
    vals = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(jnp.sum(simulate(st2, cfg2, dt, 200).positions))
        vals.append(200 / (time.perf_counter() - t0))
    print(f"[4k] steps/s over {REPS} reps: "
          + " ".join(f"{v:.0f}" for v in vals)
          + f"  (r03 artifact: 3065, r04: 2824)", flush=True)

    # culled sweep at 262k, exactly bench.py's protocol
    stc, cfgc, _ = make_scene("particle_life_large")
    u, v = FF.pair_features(stc, cfgc)
    float(jnp.sum(pallas_allpairs_forces_culled(stc.positions, u, v, cfgc)))
    vals = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(jnp.sum(pallas_allpairs_forces_culled(
            stc.positions, u, v, cfgc)))
        vals.append((time.perf_counter() - t0) * 1e3)
    print(f"[culled] ms/sweep over {REPS} reps: "
          + " ".join(f"{v:.0f}" for v in vals)
          + f"  (r03 artifact: 259, r04: 287)", flush=True)


if __name__ == "__main__":
    main()
