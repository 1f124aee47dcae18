"""Ray queries (api.raycast / api.pick_vertex) vs the oracle definition
(oracle/reference.py::raycast, Moller-Trumbore nearest hit)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softbodyunity_tpu import api
from softbodyunity_tpu.core.config import SimConfig, SpringParams
from softbodyunity_tpu.core.topology import cloth_grid
from softbodyunity_tpu.oracle import reference as oracle
from softbodyunity_tpu.solver.raycast import pick_vertex, raycast


@pytest.fixture(autouse=True)
def _restore_x64():
    prev = jax.config.jax_enable_x64
    yield
    jax.config.update("jax_enable_x64", prev)


def _scene():
    cfg = SimConfig(springs=SpringParams())
    host = cloth_grid(
        8, 8, spacing=0.1, shear=True, bend=True, pinned=("tl", "tr"),
        springs=cfg.springs, xpbd=cfg.xpbd, orientation="xy",
    )
    return host, cfg


def test_analytic_hit():
    """A ray straight down the -z axis onto the flat xy cloth hits at the
    known depth with the hit point on the ray and inside the cloth."""
    host, cfg = _scene()
    top, state = api.init(host)
    hit = api.raycast(top, state, [0.35, -0.35, 1.0], [0.0, 0.0, -1.0])
    assert float(hit.t) == pytest.approx(1.0, abs=1e-5)
    assert int(hit.tri) >= 0
    np.testing.assert_allclose(
        np.asarray(hit.point), [0.35, -0.35, 0.0], atol=1e-5
    )


def test_miss_returns_inf():
    host, cfg = _scene()
    top, state = api.init(host)
    hit = api.raycast(top, state, [5.0, 5.0, 1.0], [0.0, 0.0, -1.0])
    assert not np.isfinite(float(hit.t))
    assert int(hit.tri) == -1
    # behind the origin is also a miss (t >= 0 rule)
    hit2 = api.raycast(top, state, [0.35, -0.35, 1.0], [0.0, 0.0, 1.0])
    assert int(hit2.tri) == -1


def test_oracle_parity_random_rays_f64():
    """Device twin == oracle on a deformed cloth for 64 random rays in
    f64: identical triangle choice and exact-tier t/u/v."""
    jax.config.update("jax_enable_x64", True)
    host, cfg = _scene()
    top, state = api.init(host, dtype=jnp.float64)
    for _ in range(5):
        state = api.step(top, cfg, state)  # deform so triangles tilt
    x = np.asarray(state.x)
    rng = np.random.default_rng(0)
    origins = rng.uniform([-0.2, -0.9, 0.3], [0.9, 0.2, 1.0], (64, 3))
    dirs = rng.normal(size=(64, 3))
    dirs[:, 2] = -np.abs(dirs[:, 2]) - 0.2  # generally toward the cloth
    tris = np.asarray(top.triangles)
    for o, d in zip(origins, dirs):
        t_o, tri_o, u_o, v_o = oracle.raycast(tris, x.astype(np.float64), o, d)
        hit = raycast(top.triangles, state.x, jnp.asarray(o), jnp.asarray(d))
        assert int(hit.tri) == tri_o
        if tri_o >= 0:
            assert float(hit.t) == pytest.approx(t_o, rel=1e-12)
            assert float(hit.u) == pytest.approx(u_o, abs=1e-12)
            assert float(hit.v) == pytest.approx(v_o, abs=1e-12)


def test_pick_vertex_grabs_nearest_corner():
    """Aiming just off a vertex picks exactly that vertex; feeding it to
    move_pins drags the cloth (the mouse-grab composition)."""
    host, cfg = _scene()
    top, state = api.init(host)
    x0 = np.asarray(state.x)
    target = x0[27] + np.array([0.012, 0.009, 0.0])  # inside a 0.1 cell
    vid = api.pick_vertex(top, state, np.append(target[:2], 1.0),
                          [0.0, 0.0, -1.0])
    assert int(vid) == 27
    # miss -> -1
    assert int(api.pick_vertex(top, state, [5.0, 5.0, 1.0],
                               [0.0, 0.0, -1.0])) == -1


def test_vmap_batched_rays():
    """vmap over the ray axis: batched interaction queries in one launch."""
    host, cfg = _scene()
    top, state = api.init(host)
    origins = jnp.asarray(
        [[0.35, -0.35, 1.0], [5.0, 5.0, 1.0], [0.05, -0.65, 2.0]]
    )
    dirs = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (3, 3))
    hits = jax.vmap(lambda o, d: raycast(top.triangles, state.x, o, d))(
        origins, dirs
    )
    assert hits.t.shape == (3,)
    assert np.isfinite(np.asarray(hits.t))[[0, 2]].all()
    assert int(hits.tri[1]) == -1


def test_pick_and_drag_composition():
    """pick_vertex + move_pins: grab a vertex, drag it, the vertex lands
    exactly on the target and its neighbourhood follows."""
    host, cfg = _scene()
    top, state = api.init(host)
    vid = int(api.pick_vertex(top, state, [0.35, -0.35, 1.0],
                              [0.0, 0.0, -1.0]))
    assert vid >= 0
    target = np.asarray(state.x)[vid] + np.array([0.0, 0.0, 0.4])
    x_before = np.asarray(state.x).copy()
    state = api.move_pins(top, state, target[None, :], np.array([vid]))
    np.testing.assert_allclose(np.asarray(state.x)[vid], target, atol=1e-6)
    for _ in range(10):
        state = api.step(top, cfg, state)
    # the grabbed vertex's neighbours moved toward it
    moved = np.abs(np.asarray(state.x)[:, 2] - x_before[:, 2])
    assert moved.max() > 0.05


def test_apply_impulse_targeted_and_radial():
    """apply_impulse: targeted kicks change exactly the chosen movable
    vertices; radial blasts fall off linearly and never move pins."""
    host, cfg = _scene()
    top, state = api.init(host)
    # targeted: vertex 27 gets +z velocity; pinned vertex 0 must not
    s1 = api.apply_impulse(top, state, [0.0, 0.0, 2.0],
                           indices=np.array([27, 0]))
    v1 = np.asarray(s1.v)
    assert v1[27, 2] == pytest.approx(2.0)
    np.testing.assert_array_equal(v1[0], 0.0)   # pinned (tl)
    assert np.abs(v1).sum() == pytest.approx(2.0)  # nothing else moved
    # radial: falloff from the blast center
    c = np.asarray(state.x)[27]
    s2 = api.apply_impulse(top, state, [0.0, 0.0, 3.0], center=c,
                           radius=0.15)
    v2 = np.asarray(s2.v)
    assert v2[27, 2] == pytest.approx(3.0)      # at the center: full kick
    d = np.linalg.norm(np.asarray(state.x) - c, axis=1)
    inside = (d < 0.15) & (np.asarray(host.inv_mass) > 0)
    assert (v2[inside, 2] > 0).all()
    assert (v2[~inside] == 0).all()
    # the kick then propagates through the springs
    s2 = api.step(top, cfg, s2)
    assert np.abs(np.asarray(s2.x)[:, 2]).max() > 1e-4
