"""Rigid attachments — cloth vertices welded to a dynamic ball's body
frame (core/topology.py::attach + solver/rigid.py::_solve_attachments;
oracle ``_solve_attachments`` is the binding semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import softbodyunity_tpu as sb
from softbodyunity_tpu import api
from softbodyunity_tpu.core.config import CollisionParams, SimConfig, Solver
from softbodyunity_tpu.core.topology import attach, cloth_grid, merge_bodies
from softbodyunity_tpu.oracle import reference as oracle
from softbodyunity_tpu.solver.rigid import make_rigid_state


@pytest.fixture(autouse=True)
def _restore_x64():
    prev = jax.config.jax_enable_x64
    yield
    jax.config.update("jax_enable_x64", prev)


def _strap(solver=Solver.SEMI_IMPLICIT_EULER, ball_y=-0.55, r=0.15,
           gravity=(0.0, -9.81, 0.0), plane=False, mu=0.2):
    """A 3x8 vertical cloth strap pinned at the top; a ball centered
    under the strap's bottom edge, bottom-center vertex welded to the
    ball's TOP surface point."""
    cfg = SimConfig(
        solver=solver,
        springs=sb.SpringParams(k_structural=1500.0, k_shear=800.0,
                                k_bend=200.0, damping=1.0),
        collision=CollisionParams(enable_plane=plane, enable_spheres=True,
                                  friction=mu),
        gravity=gravity,
        global_damping=0.4,
    )
    # 3 columns x 8 rows hanging in the xy plane (built in xz, then we
    # just treat "z" as the strap's width); pinned across the top row
    host = cloth_grid(
        3, 8, spacing=0.05, mass=0.04, pinned=("top",),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-5.0,
        orientation="xy",
        sphere_centers=[[0.05, ball_y, 0.0]], sphere_radii=[r],
    )
    # bottom-center vertex: orientation="xy" hangs rows downward; find
    # the vertex closest to the ball's top pole
    pole = np.array([0.05, ball_y + r, 0.0])
    vid = int(np.argmin(np.linalg.norm(host.positions0 - pole, axis=1)))
    host = attach(host, [vid], [0], points=[host.positions0[vid]])
    return host, cfg, vid


def test_attach_builder_validation():
    cfg = SimConfig()
    h = cloth_grid(4, 4, spacing=0.1, pinned=(), springs=cfg.springs,
                   xpbd=cfg.xpbd, sphere_centers=[[0.15, -0.3, 0.15]],
                   sphere_radii=[0.1])
    with pytest.raises(ValueError, match="vertex id"):
        attach(h, [99], [0])
    with pytest.raises(ValueError, match="sphere id"):
        attach(h, [0], [2])
    h2 = attach(h, [0, 5], [0])
    assert h2.attach_ids.shape == (2,)
    # local offsets are body-frame points (identity build orientation)
    np.testing.assert_allclose(
        h2.attach_local, h.positions0[[0, 5]] - h.sphere_centers[0])
    # merge offsets vertex ids and sphere ids
    m = merge_bodies(h2, h2)
    assert list(m.attach_body) == [0, 0, 1, 1]
    assert list(m.attach_ids) == [0, 5, 16, 21]


@pytest.mark.parametrize("solver,bound", [
    (Solver.SEMI_IMPLICIT_EULER, 1e-6),
    (Solver.VERLET, 5e-4),
    (Solver.XPBD, 1e-4),
])
def test_f64_exact_parity_attached(solver, bound):
    """Device attached-pendulum trajectory == oracle, all three solvers
    (ball center, velocity, omega AND orientation quaternion)."""
    jax.config.update("jax_enable_x64", True)
    host, cfg, vid = _strap(solver=solver)
    top, state = api.init(host, dtype=jnp.float64)
    rigid = make_rigid_state(top, [0.3])
    x = host.positions0.copy()
    v = np.zeros_like(x)
    xp = x.copy()
    rc = np.asarray(host.sphere_centers, np.float64)
    rv = np.zeros_like(rc)
    rom = np.zeros_like(rc)
    rq = np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (1, 1))
    rim = np.asarray([1.0 / 0.3])
    for _ in range(25):
        x, v, xp, rc, rv, rom, rq = oracle.step_coupled(
            host, cfg, x, v, xp, rc, rv, rim, romega=rom, rq=rq)
        state, rigid = api.step_coupled(top, cfg, state, rigid)
    assert np.max(np.abs(np.asarray(state.x) - x)) < bound
    assert np.max(np.abs(np.asarray(rigid.centers) - rc)) < bound
    assert np.max(np.abs(np.asarray(rigid.velocities) - rv)) < 960 * bound
    assert np.max(np.abs(np.asarray(rigid.quat) - rq)) < bound
    assert np.max(np.abs(np.asarray(rigid.omega) - rom)) < 960 * bound


def test_kinematic_ball_drags_vertex_exactly():
    """w_b = 0: the welded vertex lands EXACTLY on the body-frame target
    every substep (the move_pins analogue, but riding a rigid body)."""
    host, cfg, vid = _strap(gravity=(0.0, 0.0, 0.0))
    top, state = api.init(host)
    r = make_rigid_state(top, [np.inf],
                         velocities=[[0.3, -0.1, 0.0]])   # scripted drift
    step = jax.jit(lambda s, r: sb.step_coupled(top, cfg, s, r))
    for _ in range(30):
        state, r = step(state, r)
    c = np.asarray(r.centers)[0]
    a = np.asarray(host.attach_local[0])
    target = c + a            # identity orientation (no spin)
    got = np.asarray(state.x)[vid]
    np.testing.assert_allclose(got, target, atol=1e-5)
    # and the strap actually follows (stretched toward the drift)
    assert np.asarray(state.x)[:, 0].max() > 0.2


def test_attachment_point_rides_rotation():
    """A spinning kinematic ball carries its surface weld around: the
    welded vertex traces the rotating offset, not the build-time one."""
    cfg = SimConfig(
        solver=Solver.SEMI_IMPLICIT_EULER,
        springs=sb.SpringParams(k_structural=40.0, damping=0.2),
        collision=CollisionParams(enable_plane=False, enable_spheres=True),
        gravity=(0.0, 0.0, 0.0),
        global_damping=0.5,
    )
    host = cloth_grid(
        2, 2, spacing=0.05, mass=0.01, pinned=(), springs=cfg.springs,
        xpbd=cfg.xpbd, plane_height=-9.0,
        sphere_centers=[[0.0, -0.5, 0.0]], sphere_radii=[0.2],
    )
    # weld vertex 0 to the +x surface point of the ball
    host = attach(host, [0], [0], points=[[0.2, -0.5, 0.0]])
    top, state = api.init(host)
    omega_z = 2.0
    r = make_rigid_state(top, [np.inf], omega=[[0.0, 0.0, omega_z]])
    step = jax.jit(lambda s, r: sb.step_coupled(top, cfg, s, r))
    t = 0.0
    for _ in range(45):
        state, r = step(state, r)
        t += cfg.dt * cfg.n_substeps   # cfg.dt is the SUBSTEP dt
    # expected weld location: the +x offset rotated by omega*t about z
    th = omega_z * t
    expect = np.array([0.0, -0.5, 0.0]) + 0.2 * np.array(
        [np.cos(th), np.sin(th), 0.0])
    got = np.asarray(state.x)[0]
    np.testing.assert_allclose(got, expect, atol=1e-3)
    # quaternion actually integrated (rotation about z by theta)
    q = np.asarray(r.quat)[0]
    assert abs(abs(q[0]) - abs(np.cos(th / 2.0))) < 1e-3


def test_attachment_conserves_momentum():
    """Free cloth + dynamic attached ball, no gravity/plane: the weld
    only EXCHANGES momentum (f64 exact)."""
    jax.config.update("jax_enable_x64", True)
    cfg = SimConfig(
        springs=sb.SpringParams(k_structural=600.0, damping=0.5),
        collision=CollisionParams(enable_plane=False, enable_spheres=True),
        gravity=(0.0, 0.0, 0.0),
        global_damping=0.0,
    )
    n = 6
    host = cloth_grid(
        n, n, spacing=0.1, mass=0.05, pinned=(), springs=cfg.springs,
        xpbd=cfg.xpbd, plane_height=-99.0, orientation="xz",
        sphere_centers=[[0.25, -0.4, 0.25]], sphere_radii=[0.15],
    )
    host = attach(host, [0], [0], points=[[0.25, -0.25, 0.25]])
    top, state = api.init(host, dtype=jnp.float64)
    m_ball = 0.7
    r = make_rigid_state(top, [m_ball])
    r = r.replace(velocities=jnp.asarray([[0.5, 1.2, -0.3]], jnp.float64))
    p0 = m_ball * np.asarray([0.5, 1.2, -0.3])
    for _ in range(12):
        state, r = api.step_coupled(top, cfg, state, r)
    p_cloth = 0.05 * np.asarray(state.v).sum(axis=0)
    p_ball = m_ball * np.asarray(r.velocities)[0]
    np.testing.assert_allclose(p_cloth + p_ball, p0, atol=1e-9)
    # the cloth was actually dragged through the weld
    assert np.abs(p_cloth).max() > 1e-3


@pytest.mark.parametrize("solver", [Solver.SEMI_IMPLICIT_EULER,
                                    Solver.VERLET, Solver.XPBD])
def test_pendulum_hangs_from_strap(solver):
    """A 0.3 kg ball welded under a pinned strap is HELD: it settles
    hanging below the pins with the weld residual at contact scale, on
    every solver."""
    host, cfg, vid = _strap(solver=solver)
    top, state = api.init(host)
    r = make_rigid_state(top, [0.3])
    step = jax.jit(lambda s, r: sb.step_coupled(top, cfg, s, r))
    for _ in range(240):
        state, r = step(state, r)
    c = np.asarray(r.centers)[0]
    # held by the strap: never fell (free fall over 4 s would be -78 m)
    assert c[1] > -1.5, c
    # weld residual small: vertex sits on the ball's (rotated) target
    from softbodyunity_tpu.solver.rigid import _quat_rotate

    a = _quat_rotate(jnp.asarray(r.quat)[0],
                     jnp.asarray(host.attach_local[0], jnp.float32))
    target = c + np.asarray(a)
    got = np.asarray(state.x)[vid]
    assert np.linalg.norm(got - target) < 5e-3
    # and it stretched the strap (hangs below its attach rest height)
    assert c[1] < np.asarray(host.sphere_centers)[0, 1] + 0.01


def test_attached_ball_swings_and_spins():
    """Weld at the ball's surface transmits TORQUE: a ball released with
    sideways velocity under a pinned strap picks up angular velocity
    (the radial-contact paths never could)."""
    host, cfg, vid = _strap()
    top, state = api.init(host)
    r = make_rigid_state(top, [0.3], velocities=[[1.5, 0.0, 0.0]])
    step = jax.jit(lambda s, r: sb.step_coupled(top, cfg, s, r))
    for _ in range(60):
        state, r = step(state, r)
    assert np.abs(np.asarray(r.omega)).max() > 0.05
    # orientation followed the spin away from identity
    assert abs(float(np.asarray(r.quat)[0, 0]) - 1.0) > 1e-4


def test_attachments_vmap_batch():
    """Attachments ride vmap: two scenes with different ball masses give
    per-scene trajectories matching their single-scene runs."""
    host, cfg, vid = _strap()
    top, state = api.init(host)

    def run_single(mass):
        r = make_rigid_state(top, [mass])
        s = state
        for _ in range(12):
            s, r = api.step_coupled(top, cfg, s, r)
        return np.asarray(r.centers)

    singles = [run_single(0.3), run_single(0.9)]

    rb = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]),
        make_rigid_state(top, [0.3]), make_rigid_state(top, [0.9]))
    sb_state = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (2,) + a.shape), state)
    from softbodyunity_tpu.solver.rigid import step_coupled_scan

    fn = jax.jit(jax.vmap(
        lambda s, r: step_coupled_scan(top, cfg, s, r, cfg.dt,
                                       cfg.n_substeps)))
    for _ in range(12):
        sb_state, rb = fn(sb_state, rb)
    np.testing.assert_allclose(np.asarray(rb.centers)[0], singles[0],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(rb.centers)[1], singles[1],
                               atol=1e-5)
