"""Batched RL env surface (BASELINE.json:11): reset/step/rollout shapes,
determinism, action effectiveness, and meshio render handoff."""

import numpy as np

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
