"""Round-5 follow-up probe: can the slab sidecar buy back (64,64) at N=8M?

probe_r5_slab8m.py measured (64,64) at ocap=0: 512 ms/step but 430 rows
masked by step 20 — 3.3M fewer slots than the gated tail-covering
(68,64)+ocap=128 point (726 ms/step, trouble 0). If a sidecar budget of
ocap 512-1024 serves that tail exactly, the 8M headline drops to
~(512 + enable + ocap-width) ms/step. The 2M retune rejected mean-hugging
because ITS tail blows up (13k rows by step 20); the question here is
whether 8M's (64,64) tail is the marginal kind (hundreds, sidecar regime)
or the blowup kind. Probes 30 steps (3 fenced windows) so the tail TREND
is visible beyond the bench's 20-step horizon.

Run from repo root on the chip: python examples/probe_r5_slab8m_meanhug.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from particle3d_tpu import SimConfig
from particle3d_tpu.parallel import (
    make_mesh, init_sharded_dense, sharded_dense_steps)

N = 8 * 1024 * 1024
DT = 1.0 / 60.0


def run_point(nsc, cap, mcap, migcap=4096, ocap=0, windows=3):
    cfg = SimConfig(world_size=100.0, neighbor="celllist_pallas",
                    cell_grid=nsc, cell_capacity=cap).validate()
    mesh = make_mesh(1)
    kw = dict(nsc=nsc, cap=cap, mcap=mcap, migcap=migcap, n=N, ocap=ocap)
    carry = init_sharded_dense(jax.random.PRNGKey(5), N, cfg, mesh,
                               nsc=nsc, cap=cap, migcap=migcap)
    hbm = sum(int(a.nbytes) for a in jax.tree.leaves(carry))
    t0 = time.perf_counter()
    carry, (mov, mask, limbo, lost, _) = sharded_dense_steps(
        carry, cfg, DT, 10, mesh, **kw)
    float(jnp.sum(carry[0][:, 0]))
    t_cold = time.perf_counter() - t0
    print(f"[probe] ({nsc},{cap}) ocap={ocap} mcap={mcap}: steps 0-10 "
          f"movers {int(mov)} masked {int(mask)} limbo {int(limbo)} "
          f"lost {int(lost)} carry {hbm/1e9:.2f} GB (cold {t_cold:.0f} s)",
          flush=True)
    for w in range(windows):
        t0 = time.perf_counter()
        carry, (mov, mask, limbo, lost, _) = sharded_dense_steps(
            carry, cfg, DT, 10, mesh, **kw)
        float(jnp.sum(carry[0][:, 0]))
        sec = (time.perf_counter() - t0) / 10
        print(f"[probe] ({nsc},{cap}) ocap={ocap} steps {10*(w+1)}-"
              f"{10*(w+2)}: {sec*1e3:.0f} ms/step = {1/sec:.2f} steps/s, "
              f"movers {int(mov)} masked {int(mask)} limbo {int(limbo)} "
              f"lost {int(lost)}", flush=True)


def main():
    print(f"[probe] backend={jax.default_backend()}", flush=True)
    # (64,64): 16.8M slots, mean occupancy 30.5 of 64 — the tail was 430
    # rows at step 20 with ocap=0. Budget 1024 gives ~2.4x headroom.
    run_point(64, 64, mcap=419840, ocap=1024)
    # the gated point, extended to 40 steps for the same tail trend
    run_point(68, 64, mcap=419840, ocap=128)


if __name__ == "__main__":
    main()
