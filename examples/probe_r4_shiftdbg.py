"""Round-4 debug: compiled vs interpret cell kernel after the shift-based
image scheme — localize which columns/slots mismatch."""
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from particle3d_tpu import reference_config, init_scene
from particle3d_tpu.models import make_scene
from particle3d_tpu.ops import forces as FF
from particle3d_tpu.ops.pallas_celllist import (
    prepare_columns, _call, pack_params)

cfg = reference_config(world_size=16.0).replace(
    neighbor="celllist_pallas", cell_grid=8, cell_capacity=32)
st = init_scene(jax.random.PRNGKey(0), 4096, cfg)
u, v = FF.pair_features(st, cfg, pad_p=8)
nsc, cap = 8, 32

pos_d, u_d, post_g, vt_g, r2_g, slot = prepare_columns(
    st.positions, u, v, cfg, nsc, cap)
pf = pack_params(cfg)

f_c = np.asarray(_call(pos_d, u_d, post_g, vt_g, r2_g, pf,
                       cfg.force_law, True, nsc, cap, False))
f_i = np.asarray(_call(pos_d, u_d, post_g, vt_g, r2_g, pf,
                       cfg.force_law, True, nsc, cap, True))
d = np.abs(f_c - f_i).max(axis=(1, 2))  # per column
bad = np.where(d > 1e-3 * max(1e-6, np.abs(f_i).max()))[0]
print("ncol", f_c.shape[0], "bad columns:", len(bad))
print("bad col ids:", bad[:40])
print("as (cx, cy):", [(int(b) // nsc, int(b) % nsc) for b in bad[:20]])
print("max abs diff", float(np.abs(f_c - f_i).max()),
      "scale", float(np.abs(f_i).max()))
# which slot within a bad column?
if len(bad):
    b = int(bad[0])
    ds = np.abs(f_c[b] - f_i[b]).max(axis=0)  # per slot
    bs = np.where(ds > 1e-3 * np.abs(f_i).max())[0]
    print(f"col {b}: bad slots {bs[:20]} (z-cells {[int(s)//cap for s in bs[:20]]})")
