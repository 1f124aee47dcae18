"""Batched RL env surface (BASELINE.json:11): reset/step/rollout shapes,
determinism, action effectiveness, and meshio render handoff."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softbodyunity_tpu import api
from softbodyunity_tpu.models import presets
from softbodyunity_tpu.parallel.rl import BatchedClothEnv, EnvSpec, make_env
from softbodyunity_tpu.utils import meshio


def _env(batch=6):
    host, cfg = presets.build("cloth_batch_rl")
    top, rest = api.init(host)
    # handles must be movable vertices (0/15 are the pinned corners)
    spec = EnvSpec(handle_ids=(240, 255), obs_ids=tuple(range(0, 256, 32)), batch=batch)
    return BatchedClothEnv(top, cfg, rest, spec)


def test_reset_step_shapes_and_determinism():
    env = _env()
    key = jax.random.PRNGKey(0)
    states, obs = env.reset(key)
    assert obs.shape == env.obs_shape
    actions = jnp.zeros(env.action_shape)
    s1, o1 = env.step(states, actions)
    s2, o2 = env.step(states, actions)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    # same key resets identically
    _, obs_b = env.reset(key)
    np.testing.assert_array_equal(np.asarray(obs), np.asarray(obs_b))


def test_actions_move_handles():
    env = _env()
    states, _ = env.reset(jax.random.PRNGKey(1))
    push = jnp.zeros(env.action_shape).at[:, :, 0].set(50.0)
    s_pushed, _ = env.step(states, push)
    s_idle, _ = env.step(states, jnp.zeros(env.action_shape))
    dx = np.asarray(s_pushed.x[:, 240, 0]) - np.asarray(s_idle.x[:, 240, 0])
    assert (dx > 1e-5).all(), "pushing a handle must move it (+x)"


def test_rollout_policy_in_scan():
    env = _env(batch=4)
    policy = lambda obs: jnp.zeros((4, 2, 3))
    states, obs = env.rollout(jax.random.PRNGKey(2), policy, n_frames=3)
    assert np.isfinite(np.asarray(states.x)).all()
    assert obs.shape == env.obs_shape


def test_meshio_obj_and_rollout(tmp_path):
    host, cfg = presets.build("cloth_32_euler")
    top, state = api.init(host)
    xs, ns, state = meshio.record_rollout(
        top, cfg, state, n_frames=3, path=str(tmp_path / "anim.npz")
    )
    assert xs.shape == (3, 1024, 3) and ns.shape == (3, 1024, 3)
    obj = tmp_path / "frame.obj"
    meshio.write_obj(str(obj), top, state)
    text = obj.read_text()
    assert text.count("\nv ") + text.startswith("v ") == 1024
    assert "\nf " in text and "\nvn " in text
    data = np.load(tmp_path / "anim.npz")
    assert data["triangles"].shape[1] == 3


def test_load_obj_roundtrip_and_forms(tmp_path):
    """load_obj: write_obj round-trip, quad fan triangulation, v/vt/vn
    index forms, negative (relative) indices, comments/garbage skipped."""
    host, cfg = presets.build("cloth_32_euler")
    top, state = api.init(host)
    obj = tmp_path / "rt.obj"
    meshio.write_obj(str(obj), top, state)
    v, f = meshio.load_obj(str(obj))
    np.testing.assert_allclose(v, np.asarray(state.x), atol=1e-6)
    np.testing.assert_array_equal(f, np.asarray(top.triangles))

    quad = tmp_path / "quad.obj"
    quad.write_text(
        "# a textured quad plus a relative-index triangle\n"
        "mtllib none.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvn 0 0 1\n"
        "f 1/1/1 2/1/1 3/1/1 4/1/1\n"
        "f -4//1 -2//1 -1//1\n"
    )
    v, f = meshio.load_obj(str(quad))
    assert v.shape == (4, 3)
    np.testing.assert_array_equal(
        f, [[0, 1, 2], [0, 2, 3], [0, 2, 3]]
    )

    bad = tmp_path / "bad.obj"
    bad.write_text("v 0 0 0\nf 1 2 3\n")
    with pytest.raises(ValueError, match="out of range"):
        meshio.load_obj(str(bad))


def test_load_obj_to_softbody_and_collider(tmp_path):
    """The asset pipeline end-to-end: an OBJ becomes (a) a simulated soft
    body via from_triangle_mesh and (b) a static collider via
    sdf_from_mesh."""
    from softbodyunity_tpu.core.sdf import sdf_from_mesh
    from softbodyunity_tpu.core.topology import from_triangle_mesh
    from softbodyunity_tpu.oracle.reference import _sdf_sample_grad

    cube = tmp_path / "cube.obj"
    cube.write_text(
        "v -1 -1 -1\nv 1 -1 -1\nv 1 1 -1\nv -1 1 -1\n"
        "v -1 -1 1\nv 1 -1 1\nv 1 1 1\nv -1 1 1\n"
        "f 1 3 2\nf 1 4 3\nf 5 6 7\nf 5 7 8\n"
        "f 1 2 6\nf 1 6 5\nf 2 3 7\nf 2 7 6\n"
        "f 3 4 8\nf 3 8 7\nf 4 1 5\nf 4 5 8\n"
    )
    v, f = meshio.load_obj(str(cube))
    cfg = presets.build("cloth_32_euler")[1]
    host = from_triangle_mesh(v, f, mass=1.0, pinned_ids=(0,),
                              springs=cfg.springs, xpbd=cfg.xpbd)
    top, state = api.init(host)
    for _ in range(3):
        state = api.step(top, cfg, state)
    assert np.isfinite(np.asarray(state.x)).all()

    grid, origin, h = sdf_from_mesh(v, f, resolution=12)
    phi, _ = _sdf_sample_grad(grid, origin, np.float64(h),
                              np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.1]]))
    assert phi[0] < -0.8 and phi[1] > 0.05


def _coupled_env(batch=4):
    """A trampoline scene with a dynamic ball as a coupled RL env."""
    import softbodyunity_tpu as sb
    from softbodyunity_tpu.core.config import CollisionParams, SimConfig
    from softbodyunity_tpu.core.topology import cloth_grid

    cfg = SimConfig(
        springs=sb.SpringParams(k_structural=2000.0, k_shear=1000.0,
                                k_bend=400.0, damping=1.5),
        collision=CollisionParams(enable_plane=True, enable_spheres=True,
                                  friction=0.2),
        global_damping=0.8,
    )
    n = 8
    host = cloth_grid(
        n, n, spacing=1.0 / (n - 1), mass=0.08,
        pinned=("top", "bottom", "left", "right"),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-2.0,
        orientation="xz",
        sphere_centers=[[0.5, 0.35, 0.5]], sphere_radii=[0.2],
    )
    top, rest = api.init(host)
    # center vertices as handles (the pinned border can't move)
    mid = (n // 2) * n + n // 2
    spec = EnvSpec(handle_ids=(mid, mid + 1), obs_ids=(mid,), batch=batch,
                   rigid_masses=(0.3,))
    return BatchedClothEnv(top, cfg, rest, spec)


def test_coupled_env_ball_in_obs_and_state():
    """EnvSpec.rigid_masses promotes the scene's ball to per-scene dynamic
    state: obs gains its [center, velocity] row and the env state is
    (State, RigidState)."""
    env = _coupled_env()
    assert env.obs_shape == (4, 2, 6)          # 1 obs vertex + 1 ball
    key = jax.random.PRNGKey(0)
    env_state, obs = env.reset(key)
    states, rigids = env_state
    assert rigids.centers.shape == (4, 1, 3)
    y0 = float(obs[0, -1, 1])                  # ball center y
    for _ in range(20):
        env_state, obs = env.step(env_state, jnp.zeros(env.action_shape))
    states, rigids = env_state
    assert np.isfinite(np.asarray(states.x)).all()
    assert np.isfinite(np.asarray(rigids.centers)).all()
    # the ball fell toward the cloth (observation row tracks it)
    assert float(obs[0, -1, 1]) < y0
    # and was caught (coupled contact), not dropped to the floor at -2
    assert float(obs[0, -1, 1]) > -1.5


def test_coupled_env_rollout():
    env = _coupled_env()

    def policy(obs):
        return jnp.zeros(env.action_shape, obs.dtype)

    env_state, obs = env.rollout(jax.random.PRNGKey(2), policy, 10)
    states, rigids = env_state
    assert np.isfinite(np.asarray(states.x)).all()
    assert obs.shape == env.obs_shape
