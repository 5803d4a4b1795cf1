"""Round-5 probe: the 262k preset's exactness horizon, and what longer
windows buy.

The bench's 262k production key is the ALL-IN window-16 rate (one-time
dense build + final scatter_back included). Those fixed costs amortize
with window length, so IF the scene stays exact past 16 steps from init
(the 1M preset does not — its horizon is < 32, docs/PERF.md round 4),
a longer window is a strictly better production configuration and an
honest headline. This probe (a) finds the horizon: max window from init
with capacity-masked == 0 at the preset (24, 32) + ocap=128 geometry,
and (b) prices the exact window lengths all-in, warmed and fenced.

Run from repo root on the chip: python examples/probe_r5_262khorizon.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from particle3d_tpu.models import make_scene
from particle3d_tpu.engine.step import simulate_dense


def main():
    st, cfg, dt = make_scene("particle_life_large")
    print(f"[probe] backend={jax.default_backend()}", flush=True)

    horizon = []
    for k in (16, 24, 32, 48, 64):
        out, (mov, mis) = simulate_dense(st, cfg, dt, k)
        jax.block_until_ready(out.positions)
        print(f"[probe] window-{k}: max movers {int(mov)}, "
              f"capacity-masked {int(mis)}", flush=True)
        horizon.append((k, int(mis)))

    for k, mis in horizon:
        if mis:
            continue
        float(jnp.sum(simulate_dense(st, cfg, dt, k)[0].positions))  # warm
        t0 = time.perf_counter()
        for _ in range(2):
            float(jnp.sum(simulate_dense(st, cfg, dt, k)[0].positions))
        sec = (time.perf_counter() - t0) / 2
        print(f"[probe] window-{k} all-in: {sec * 1e3:7.1f} ms = "
              f"{k / sec:6.2f} steps/s ({sec * 1e3 / k:5.2f} ms/step)",
              flush=True)


if __name__ == "__main__":
    main()
