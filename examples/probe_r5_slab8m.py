"""Round-5 probe: N=8M stay-sharded slab carry on ONE chip, exact.

Round 3's 8M attempt was a capacity experiment (64^3 hot gas at world 64,
~31% movers/step, masked thousands — docs/PERF.md "the ~9-11M-slot
ceiling"); this probes the honest point: the SAME 8 particles/unit^3
density as the gated 2M flagship (world 100 for N=8M), tail-covering
capacity, round-5 static-bound right-sizing (migcap=4096 on a 1-device
mesh, mcap ~2.25x observed movers). Goal: trouble == 0 through 20 steps
from init and a fenced 10-step rate — the candidate bench point
`slab_steps_per_s_N8M`, 4x the largest currently-gated N.

Run from repo root on the chip: python examples/probe_r5_slab8m.py
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


def run_point(nsc, cap, mcap, migcap=4096, ocap=0):
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
    print(f"[probe] ({nsc},{cap}) mcap={mcap}: steps 0-10 movers {int(mov)} "
          f"masked {int(mask)} limbo {int(limbo)} lost {int(lost)} "
          f"carry {hbm/1e9:.2f} GB (cold {t_cold:.0f} s)", flush=True)
    t0 = time.perf_counter()
    carry, (mov, mask, limbo, lost, _) = sharded_dense_steps(
        carry, cfg, DT, 10, mesh, **kw)
    float(jnp.sum(carry[0][:, 0]))
    sec = (time.perf_counter() - t0) / 10
    used = (jax.devices()[0].memory_stats() or {}).get("bytes_in_use", 0)
    print(f"[probe] ({nsc},{cap}) steps 10-20: {sec*1e3:.0f} ms/step = "
          f"{1/sec:.2f} steps/s, movers {int(mov)} masked {int(mask)} "
          f"limbo {int(limbo)} lost {int(lost)}, device in-use "
          f"{used/1e9:.2f} GB", flush=True)


def sidecar_point():
    # (68,64) masked 16 by step 20 — the marginal tail, exactly the slab
    # sidecar's regime (serve it; don't pay (72,64)'s +19% slots).
    # mcap right-sized to 2.25x the observed 186k movers, half-rung aligned.
    print("[probe] sidecar variant:", flush=True)
    run_point(68, 64, mcap=419840, ocap=128)


def main():
    print(f"[probe] backend={jax.default_backend()}", flush=True)
    # mean-occupancy ladder at tail-covering cap 64 (the 2M finding: this
    # scene's tail outruns any sidecar budget — cover it, ocap=0)
    run_point(68, 64, mcap=524288)   # width 1.47, mean 25.4, 20.1M slots
    run_point(64, 64, mcap=524288)   # width 1.56, mean 30.5, 16.8M slots
    sidecar_point()


if __name__ == "__main__":
    main()
