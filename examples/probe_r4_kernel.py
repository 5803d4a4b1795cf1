"""Round-4 probe: the shift-based (no per-pair minimum-image) cell kernel —
compiled-mode equivalence vs the triangular all-pairs kernel + sweep cost
via in-scan slope at both production presets."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from particle3d_tpu.models import make_scene
from particle3d_tpu.ops import forces as FF
from particle3d_tpu.ops.pallas_celllist import pallas_celllist_forces
from particle3d_tpu.ops.pallas_allpairs import pallas_allpairs_forces_tri


def fence(x):
    return float(jnp.sum(x))


def slope(make, k1=8, k2=24, iters=5):
    f1, f2 = make(k1), make(k2)
    fence(f1())
    fence(f2())
    t0 = time.perf_counter()
    for _ in range(iters):
        fence(f1())
    t1 = (time.perf_counter() - t0) / iters
    t0 = time.perf_counter()
    for _ in range(iters):
        fence(f2())
    t2 = (time.perf_counter() - t0) / iters
    return (t2 - t1) / (k2 - k1)


for preset in ("particle_life_large", "particle_life_1m"):
    st, cfg, _ = make_scene(preset)
    u, v = FF.pair_features(st, cfg)

    f_cell = np.asarray(pallas_celllist_forces(st.positions, u, v, cfg))
    f_tri = np.asarray(pallas_allpairs_forces_tri(st.positions, u, v, cfg))
    sc = max(1e-6, float(np.max(np.abs(f_tri))))
    rel = float(np.max(np.abs(f_cell - f_tri))) / sc

    def make(k):
        @jax.jit
        def go():
            def it(p, _):
                f = pallas_celllist_forces(p, u, v, cfg)
                return p + f * 1e-12, None
            p, _ = jax.lax.scan(it, st.positions, None, length=k)
            return p
        return go

    ms = slope(make) * 1e3
    print(f"{preset} ({cfg.cell_grid},{cfg.cell_capacity}): kernel "
          f"{ms:.2f} ms/sweep  rel_err_vs_tri {rel:.2e}", flush=True)
