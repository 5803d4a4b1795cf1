"""Orbax checkpoint backend (utils/orbax_ckpt.py): round trip, async save,
step listing, sharded restore."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytest.importorskip("orbax.checkpoint")

from particle3d_tpu import reference_config, init_scene, simulate
from particle3d_tpu.utils.orbax_ckpt import OrbaxCheckpointer


def _scene(n=128):
    cfg = reference_config()
    return init_scene(jax.random.PRNGKey(0), n, cfg), cfg


def test_round_trip(tmp_path):
    st, cfg = _scene()
    ck = OrbaxCheckpointer(str(tmp_path / "ck"))
    ck.save(30, st, cfg, extra={"note": "x"})
    out, cfg2, step = ck.restore()
    assert step == 30
    np.testing.assert_array_equal(np.asarray(out.positions),
                                  np.asarray(st.positions))
    np.testing.assert_array_equal(np.asarray(out.species),
                                  np.asarray(st.species))
    assert float(np.asarray(cfg2.world_size)) == float(np.asarray(cfg.world_size))
    np.testing.assert_array_equal(np.asarray(cfg2.attraction_matrix),
                                  np.asarray(cfg.attraction_matrix))
    ck.close()


def test_resume_continues_trajectory(tmp_path):
    st, cfg = _scene()
    dt = jnp.float32(1 / 60)
    mid = simulate(st, cfg, dt, 5)
    ck = OrbaxCheckpointer(str(tmp_path / "ck"))
    ck.save(5, mid, cfg)
    got, cfg2, _ = ck.restore(5)
    end_a = simulate(mid, cfg, dt, 5)
    end_b = simulate(got, cfg2.replace(neighbor=cfg.neighbor), dt, 5)
    np.testing.assert_array_equal(np.asarray(end_a.positions),
                                  np.asarray(end_b.positions))
    ck.close()


def test_async_save_and_steps(tmp_path):
    st, cfg = _scene()
    ck = OrbaxCheckpointer(str(tmp_path / "ck"), async_save=True)
    ck.save(10, st, cfg)
    ck.save(20, st, cfg)
    ck.wait()
    assert ck.steps() == [10, 20]
    _, _, step = ck.restore()
    assert step == 20
    ck.close()


def test_sharded_restore(tmp_path):
    from particle3d_tpu.parallel import make_mesh, particle_sharding

    st, cfg = _scene(n=128)
    ck = OrbaxCheckpointer(str(tmp_path / "ck"))
    ck.save(0, st, cfg)
    mesh = make_mesh(8)
    sh = particle_sharding(mesh)
    out, _, _ = ck.restore(0, sharding=sh)
    assert out.positions.sharding.is_equivalent_to(sh, out.positions.ndim)
    np.testing.assert_array_equal(np.asarray(out.positions),
                                  np.asarray(st.positions))
    ck.close()
