"""Round-5 probe: where does the slab sidecar's ~16 ms/step fixed cost at
the 2M point come from? Times `slab_neighborhood_sweeps` ALONE (jitted, on
realistic shapes for (44,64) d=1) across ocap values. If the sweep alone
accounts for the step delta measured in probe_r5_slab2m, the cost is the
window gathers/scatter; if it is small, the cost lives in the step wiring
(worklist maintenance in move_phase, the extra O(S) force passes).

Run ON THE CHIP: python examples/probe_r5_sweepcost2m.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from particle3d_tpu import SimConfig
from particle3d_tpu.ops.overflow import slab_neighborhood_sweeps
from particle3d_tpu.ops.pallas_allpairs import PAIR_P


def main():
    nsc, cap, planes = 44, 64, 44           # (44,64) on a 1-device mesh
    cs = nsc * cap
    k_loc = planes * nsc * nsc
    s_loc = k_loc * cap
    n_ext = (planes + 2) * nsc
    cfg = SimConfig(world_size=64.0, neighbor="celllist_pallas",
                    cell_grid=nsc, cell_capacity=cap).validate()
    key = jax.random.PRNGKey(0)
    ext = jax.random.normal(key, (n_ext, cs, 3 + PAIR_P + 1), jnp.float32)
    u_all = jax.random.normal(key, (s_loc, PAIR_P), jnp.float32)

    fn = jax.jit(slab_neighborhood_sweeps,
                 static_argnames=("nsc", "planes_local", "cap"))
    for ocap in (128, 512, 1024, 2048):
        mpos = jax.random.uniform(key, (ocap, 3), jnp.float32,
                                  minval=-30.0, maxval=30.0)
        mu = jax.random.normal(key, (ocap, PAIR_P), jnp.float32)
        mv = jax.random.normal(key, (ocap, PAIR_P), jnp.float32)
        mvalid = jnp.arange(ocap) < ocap // 4  # quarter live, rest dead
        me = jnp.int32(0)
        f_mis, f_from = fn(ext, u_all, mpos, mu, mv, mvalid, cfg, nsc,
                           planes, cap, me)
        float(jnp.sum(f_mis)) + float(jnp.sum(f_from))  # compile+warm
        t0 = time.perf_counter()
        for _ in range(10):
            f_mis, f_from = fn(ext, u_all, mpos, mu, mv, mvalid, cfg, nsc,
                               planes, cap, me)
            float(jnp.sum(f_mis)) + float(jnp.sum(f_from))
        sec = (time.perf_counter() - t0) / 10
        print(f"[sweep] ocap={ocap}: {sec*1e3:.2f} ms/call "
              f"(f_from scatter target {s_loc} slots)", flush=True)


if __name__ == "__main__":
    main()
