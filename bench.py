#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: pair-interactions/sec of the tiled Pallas all-pairs force kernel
inside the full fused simulation step at N=262,144 (BASELINE.json config 3
scale), on whatever accelerator JAX finds. vs_baseline is measured against
the 1e11 pairs/s target from BASELINE.json.

Extra context (steps/sec at N=4k and N=262k, trajectory-parity L2) is
emitted on stderr so stdout stays a single JSON line.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from particle3d_tpu import reference_config, init_scene, simulate

    backend = jax.default_backend()
    dev = jax.devices()[0]
    print(f"[bench] backend={backend} device={dev.device_kind}", file=sys.stderr)

    on_tpu = dev.platform == "tpu"
    neighbor = "allpairs_pallas" if on_tpu else "allpairs"

    results = {}
    dt = 1.0 / 60.0

    # --- headline: N=262k all-pairs pairs/sec -----------------------------
    n = 262144 if on_tpu else 4096  # CPU fallback keeps the harness runnable
    cfg = reference_config(world_size=40.0).replace(neighbor=neighbor)
    st = init_scene(jax.random.PRNGKey(0), n, cfg)

    t0 = time.perf_counter()
    out = simulate(st, cfg, dt, 1)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    print(f"[bench] N={n} compile+first-step: {compile_s:.1f}s", file=sys.stderr)

    steps = 5 if on_tpu else 3
    t0 = time.perf_counter()
    out = simulate(st, cfg, dt, steps)
    jax.block_until_ready(out)
    el = time.perf_counter() - t0
    steps_per_s = steps / el
    pairs_per_s = float(n) * float(n) * steps_per_s
    results["steps_per_s_262k" if on_tpu else "steps_per_s_small"] = steps_per_s
    print(f"[bench] N={n}: {steps_per_s:.3f} steps/s, "
          f"{pairs_per_s:.3e} pair-interactions/s", file=sys.stderr)

    # --- secondary: N=4096 steps/sec (reference demo scale, x4) ----------
    if on_tpu:
        n2 = 4096
        cfg2 = reference_config().replace(neighbor=neighbor)
        st2 = init_scene(jax.random.PRNGKey(1), n2, cfg2)
        out = simulate(st2, cfg2, dt, 1)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = simulate(st2, cfg2, dt, 200)
        jax.block_until_ready(out)
        el2 = time.perf_counter() - t0
        results["steps_per_s_4k"] = 200 / el2
        print(f"[bench] N=4096: {200 / el2:.1f} steps/s", file=sys.stderr)

    baseline = 1e11  # BASELINE.json: >=1e11 pair-interactions/s target
    print(json.dumps({
        "metric": "pair_interactions_per_sec_allpairs_N262k" if on_tpu
        else "pair_interactions_per_sec_allpairs_smallN_cpu_fallback",
        "value": pairs_per_s,
        "unit": "pairs/s",
        "vs_baseline": pairs_per_s / baseline,
    }))


if __name__ == "__main__":
    main()
