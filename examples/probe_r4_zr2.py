"""Round-4 micro: re-sweep the z sub-chunk height zr2 under the shift-based
kernel (the old zr2=2 choice was measured on the minimum-image op mix).
zr2=1 sweeps 9*3*cap sources per receiver row vs zr2=2's 9*4*cap — 25%
fewer pair-slots at more per-sub overhead."""
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
from particle3d_tpu.ops.pallas_celllist import prepare_columns, _call, pack_params


def fence(x):
    return float(jnp.sum(x))


def slope(make, k1=6, k2=18, iters=4):
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
    return (t2 - t1) / (k2 - k1) * 1e3


for preset in ("particle_life_large", "particle_life_1m"):
    st, cfg, _ = make_scene(preset)
    nsc, cap = cfg.cell_grid, cfg.cell_capacity
    u, v = FF.pair_features(st, cfg, pad_p=8)
    pos_d, u_d, post_g, vt_g, r2_g, _ = prepare_columns(
        st.positions, u, v, cfg, nsc, cap)
    pf = pack_params(cfg)
    base = None
    for zr2 in (1, 2, 4):
        def make(k, zr2=zr2):
            @jax.jit
            def go():
                def it(p, _):
                    f = _call(p, u_d, post_g, vt_g, r2_g, pf,
                              cfg.force_law, True, nsc, cap, False, zr2=zr2)
                    return p + f * 1e-30, None
                p, _ = jax.lax.scan(it, pos_d, None, length=k)
                return p
            return go
        try:
            ms = slope(make)
            f = np.asarray(_call(pos_d, u_d, post_g, vt_g, r2_g, pf,
                                 cfg.force_law, True, nsc, cap, False,
                                 zr2=zr2))
            if base is None:
                base = f
            err = float(np.abs(f - base).max())
            print(f"{preset} ({nsc},{cap}) zr2={zr2}: {ms:.2f} ms/sweep  "
                  f"max_diff_vs_first {err:.2e}", flush=True)
        except Exception as e:
            print(f"{preset} zr2={zr2}: FAILED {str(e)[:100]}", flush=True)
