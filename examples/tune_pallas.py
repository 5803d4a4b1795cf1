#!/usr/bin/env python
"""Sweep Pallas all-pairs tile geometry on the real chip.

Usage: python examples/tune_pallas.py [N]
"""

import sys
import jax.numpy as jnp
import time

import jax
import numpy as np

from particle3d_tpu import reference_config, init_scene
from particle3d_tpu.ops import forces as F
from particle3d_tpu.ops.pallas_allpairs import pallas_allpairs_forces


def time_call(fn, iters=3):
    # NOTE: on the axon remote-execution platform, block_until_ready can
    # return at enqueue time for a single dispatch; force a host-visible
    # data dependency (scalar reduction -> float) to measure real runtime.
    _ = float(jnp.sum(fn()))
    t0 = time.perf_counter()
    for _ in range(iters):
        chk = float(jnp.sum(fn()))
    return (time.perf_counter() - t0) / iters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    cfg = reference_config(world_size=40.0)
    st = init_scene(jax.random.PRNGKey(0), n, cfg)
    u, v = F.pair_features(st, cfg)

    geoms = [
        (256, 512, 16),
        (256, 512, 32),
        (512, 512, 16),
        (512, 768, 8),
        (384, 512, 16),
        (256, 1024, 8),
        (128, 512, 16),
        (256, 2048, 4),
    ]
    for ti, tj, sub in geoms:
        try:
            fn = lambda: pallas_allpairs_forces(
                st.positions, u, v, cfg, ti=ti, tj=tj, subtiles=sub)
            el = time_call(fn)
            pairs = float(n) * float(n)
            print(f"ti={ti:5d} tj={tj:5d} sub={sub:3d}: {el*1e3:8.2f} ms  "
                  f"{pairs/el:.3e} pairs/s")
        except Exception as e:
            print(f"ti={ti:5d} tj={tj:5d} sub={sub:3d}: FAILED {type(e).__name__}: {e}")
            continue


if __name__ == "__main__":
    main()
