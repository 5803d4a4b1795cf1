"""Round-5 probe: re-tune the 2M stay-sharded slab point with the overflow
sidecar (ROADMAP 20 follow-through — VERDICT r4 item 1's last done-bar).

Round 4 tuned the slab 2M bench at the TAIL-COVERING (44, 64) because the
slab path had no sidecar (5.08 steps/s, BENCH_r04). With the sidecar ported,
mean-hugging geometries become exact: this probe times the bench's exact
protocol (10-step warm window, then a fenced 10-step window) across
candidate geometries, recording unserved trouble (must be 0) and the
observed sidecar load upper bound via an ocap=0 control arm's mask+limbo.

Run ON THE CHIP: python examples/probe_r5_slab2m.py [--arms ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from particle3d_tpu import SimConfig
from particle3d_tpu.parallel import make_mesh, init_sharded_dense, \
    sharded_dense_steps

N = 2_097_152
DT = 1.0 / 60.0


def arm(nsc, cap, mcap, ocap, migcap=None, steps=10):
    cfg = SimConfig(world_size=64.0, neighbor="celllist_pallas",
                    cell_grid=nsc, cell_capacity=cap).validate()
    mesh = make_mesh(1)
    carry = init_sharded_dense(jax.random.PRNGKey(5), N, cfg, mesh,
                               nsc=nsc, cap=cap, migcap=migcap)
    hbm = sum(int(a.nbytes) for a in jax.tree.leaves(carry))
    t0 = time.perf_counter()
    carry, diag0 = sharded_dense_steps(carry, cfg, DT, steps, mesh, nsc=nsc,
                                       cap=cap, mcap=mcap, migcap=migcap,
                                       n=N, ocap=ocap)
    float(jnp.sum(carry[0][:, 0]))
    compile_and_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    carry, (mov, mask, limbo, lost, _) = sharded_dense_steps(
        carry, cfg, DT, steps, mesh, nsc=nsc, cap=cap, mcap=mcap,
        migcap=migcap, n=N, ocap=ocap)
    float(jnp.sum(carry[0][:, 0]))
    sec = (time.perf_counter() - t0) / steps
    print(f"[2m] ({nsc},{cap}) ocap={ocap} mcap={mcap} migcap={migcap}: "
          f"{1/sec:.2f} steps/s "
          f"({sec*1e3:.1f} ms/step), warm window mask={int(diag0[1])} "
          f"limbo={int(diag0[2])}, timed window mov={int(mov)} "
          f"mask={int(mask)} limbo={int(limbo)} lost={int(lost)}, "
          f"carry {hbm/1e9:.2f} GB (compile+warm {compile_and_warm:.0f}s)",
          flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--arms", nargs="*", default=None,
                   help="nsc,cap,mcap,ocap[,migcap] tuples")
    a = p.parse_args()
    arms = a.arms or ["44,64,131072,0", "48,32,131072,0",
                      "48,32,131072,1024", "64,16,131072,2048"]
    for s in arms:
        parts = [int(x) for x in s.split(",")]
        nsc, cap, mcap, ocap = parts[:4]
        migcap = parts[4] if len(parts) > 4 else None
        try:
            arm(nsc, cap, mcap, ocap, migcap)
        except Exception as e:
            print(f"[2m] ({nsc},{cap}) ocap={ocap}: FAILED {e}", flush=True)
