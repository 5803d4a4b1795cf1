"""Ghost+MXU all-pairs backend (ops/pallas_allpairs_mxu.py) vs the dense XLA
reference, interpret mode. Covers ghost-image coverage of periodic forces,
both precision modes, and the Q8 self/coincidence gate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from particle3d_tpu import reference_config, init_scene
from particle3d_tpu.config import SimConfig
from particle3d_tpu.state import from_numpy
from particle3d_tpu.ops import forces as F
from particle3d_tpu.ops.allpairs import allpairs_forces
from particle3d_tpu.ops.pallas_allpairs_mxu import (
    pallas_allpairs_forces_mxu, ghost_count, recommended_ghost_capacity,
    _build_ghosts)


@pytest.fixture(scope="module", autouse=True)
def _fresh_compiler_state():
    """Full-suite runs segfault inside XLA:CPU ``backend_compile_and_load``
    when this module's interpret-mode MXU program is compiled after the
    ~180 programs the preceding test files accumulate (order-dependent:
    this module passes solo and in every two-file pairing tried — the
    trigger is cumulative compiler/JIT state, not any specific test).
    Dropping the executable + tracing caches before the first MXU compile
    keeps the suite green in one process."""
    jax.clear_caches()
    yield


def _scene(seed, n, cfg):
    rng = np.random.default_rng(seed)
    half = float(np.asarray(cfg.world_size)) / 2
    pos = rng.uniform(-half, half, (n, 3)).astype(np.float32)
    species = rng.integers(0, cfg.id_count, n).astype(np.int32)
    return from_numpy(pos, np.zeros_like(pos), species)


CASES = [
    ("particle_life_wrap", reference_config()),
    ("particle_life_nowrap",
     reference_config().replace(wrap_forces=False, boundary="clamp")),
    ("gravity", SimConfig(force_law="gravity", particle_effect_radius=3.0,
                          world_size=12.0, gravity_softening=0.1).validate()),
    ("lj", SimConfig(force_law="lennard_jones", particle_effect_radius=0.8,
                     lj_sigma=0.3).validate()),
    ("spring", SimConfig(force_law="spring", particle_effect_radius=1.5,
                         spring_rest_length=0.7).validate()),
]


@pytest.mark.parametrize("name,cfg", CASES, ids=[c[0] for c in CASES])
def test_mxu_matches_dense_exact(name, cfg):
    st = _scene(3, 257, cfg)  # odd N exercises tile padding
    u, v = F.pair_features(st, cfg)
    want = np.asarray(allpairs_forces(st.positions, u, v, cfg))
    got = np.asarray(pallas_allpairs_forces_mxu(
        st.positions, u, v, cfg, t=64, interpret=True))
    scale = max(float(np.abs(want).max()), 1e-9)
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-5)


@pytest.mark.parametrize("name,cfg", CASES[:2], ids=[c[0] for c in CASES[:2]])
def test_mxu_fast_mode_tolerance(name, cfg):
    """precision='fast' computes d^2 on the MXU — documented ~1e-3 relative."""
    st = _scene(4, 200, cfg)
    u, v = F.pair_features(st, cfg)
    want = np.asarray(allpairs_forces(st.positions, u, v, cfg))
    got = np.asarray(pallas_allpairs_forces_mxu(
        st.positions, u, v, cfg, t=64, precision="fast", interpret=True))
    scale = max(float(np.abs(want).max()), 1e-9)
    np.testing.assert_allclose(got / scale, want / scale, atol=3e-3)


def test_ghost_images_carry_wrap_forces():
    """A pair only in range through the periodic image must interact."""
    cfg = reference_config()
    w = 10.0
    pos = np.zeros((2, 3), np.float32)
    pos[0, 0] = -w / 2 + 0.1
    pos[1, 0] = w / 2 - 0.4  # image distance 0.5 < cutoff, direct 9.5
    st = from_numpy(pos, np.zeros_like(pos), np.array([0, 1], np.int32))
    u, v = F.pair_features(st, cfg)
    want = np.asarray(allpairs_forces(st.positions, u, v, cfg))
    got = np.asarray(pallas_allpairs_forces_mxu(
        st.positions, u, v, cfg, t=8, interpret=True))
    assert np.abs(want).max() > 1e-3  # the pair really interacts
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    assert int(ghost_count(st.positions, cfg)) == 2


def test_coincident_particles_zero_force():
    """Quirk Q8 (src/lib.rs:216): coincident particles exert no force."""
    cfg = reference_config()
    pos = np.zeros((4, 3), np.float32)
    pos[2:] = 2.5  # a second coincident pair, away from the first
    st = from_numpy(pos, np.zeros_like(pos),
                    np.array([0, 1, 2, 3], np.int32))
    u, v = F.pair_features(st, cfg)
    got = np.asarray(pallas_allpairs_forces_mxu(
        st.positions, u, v, cfg, t=8, interpret=True))
    np.testing.assert_allclose(got, 0.0, atol=1e-7)


def test_ghost_count_within_recommended_capacity():
    cfg = reference_config(world_size=20.0)
    st = init_scene(jax.random.PRNGKey(0), 4096, cfg)
    cap = recommended_ghost_capacity(cfg, 4096)
    assert int(ghost_count(st.positions, cfg)) <= cap


def test_ghost_build_validity_mask():
    cfg = reference_config()
    st = _scene(5, 100, cfg)
    u, v = F.pair_features(st, cfg, pad_p=8)
    gpos, gu, gv, valid = _build_ghosts(st.positions, u, v, cfg, 512)
    n_valid = int(valid.sum())
    assert n_valid == int(ghost_count(st.positions, cfg))
    # every valid ghost lies outside the box but within the cutoff shell
    g = np.asarray(gpos)[np.asarray(valid)]
    assert (np.abs(g) > 5.0 - 1.0 - 1e-5).any(axis=1).all()
    assert (np.abs(g) < 5.0 + 1.0 + 1e-5).all()


def test_step_backend_dispatch():
    """neighbor='allpairs_mxu' runs through the fused step."""
    from particle3d_tpu.engine.step import step

    cfg = reference_config().replace(neighbor="allpairs_mxu")
    st = init_scene(jax.random.PRNGKey(1), 128, cfg)
    cfg_ref = cfg.replace(neighbor="allpairs")
    a = step(st, cfg, jnp.float32(1 / 60))
    b = step(st, cfg_ref, jnp.float32(1 / 60))
    np.testing.assert_allclose(np.asarray(a.positions),
                               np.asarray(b.positions), rtol=1e-4, atol=1e-5)


def test_traced_config_requires_static_ghost_capacity():
    cfg = reference_config().replace(neighbor="allpairs_mxu")
    st = init_scene(jax.random.PRNGKey(2), 64, cfg)

    from particle3d_tpu.engine.step import step

    with pytest.raises(ValueError, match="ghost"):
        jax.jit(step)(st, cfg, jnp.float32(1 / 60))

    cfg_ok = cfg.replace(
        ghost_capacity=recommended_ghost_capacity(cfg, 64))
    out = jax.jit(step)(st, cfg_ok, jnp.float32(1 / 60))
    assert out.positions.shape == (64, 3)
