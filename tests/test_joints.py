"""Rigid-rigid joints (add_rigid_joint): ball / hinge / distance joints
between dynamic spheres, boxes, and the world, resolved by the coupled
solvers.  Binding semantics: oracle.reference._solve_rigid_joints."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import softbodyunity_tpu as sb
from softbodyunity_tpu import api
from softbodyunity_tpu.core.config import (
    CollisionParams, SimConfig, Solver, SpringParams)
from softbodyunity_tpu.core.topology import (
    add_colliders, add_rigid_joint, cloth_grid, merge_bodies)
from softbodyunity_tpu.oracle import reference as oracle
from softbodyunity_tpu.solver.rigid import make_rigid_state


@pytest.fixture(autouse=True)
def _restore_x64():
    prev = jax.config.jax_enable_x64
    yield
    jax.config.update("jax_enable_x64", prev)


def _far_cloth(cfg, spheres, radii, origin=(50.0, 0.0, 0.0)):
    """Tiny pinned cloth parked far from the bodies (the coupled step
    needs a cloth; these tests exercise the rigid graph)."""
    return cloth_grid(
        2, 2, spacing=0.1, pinned=("top",), springs=cfg.springs,
        xpbd=cfg.xpbd, plane_height=-10.0, origin=origin, orientation="xy",
        sphere_centers=spheres, sphere_radii=radii)


def _jointed_scene(solver):
    """Cloth + 2 dynamic balls + 1 dynamic box wired with all four joint
    shapes (world ball, compliant distance, world hinge, ball-box ball)."""
    cfg = SimConfig(
        solver=solver,
        springs=SpringParams(k_structural=2000.0, k_shear=1000.0,
                             k_bend=400.0, damping=1.5),
        collision=CollisionParams(enable_plane=True, enable_spheres=True,
                                  enable_boxes=True, restitution=0.3,
                                  friction=0.4),
        global_damping=0.5)
    host = cloth_grid(
        8, 8, spacing=0.1, mass=0.05, pinned=("top",),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-1.0,
        orientation="xy",
        sphere_centers=[[0.1, -0.2, 0.1], [0.4, -0.2, 0.1]],
        sphere_radii=[0.06, 0.05])
    host = add_colliders(host, box_centers=[[0.2, 0.3, 0.2]],
                         box_half_extents=[[0.08, 0.05, 0.06]],
                         box_rotations=[np.eye(3)])
    host = add_rigid_joint(host, ("sphere", 0), None, point=[0.1, 0.0, 0.1])
    host = add_rigid_joint(host, ("sphere", 0), ("sphere", 1),
                           kind="distance", compliance=1e-3)
    host = add_rigid_joint(host, ("box", 0), None, point=[0.12, 0.3, 0.2],
                           axis=[0, 0, 1])
    host = add_rigid_joint(host, ("sphere", 1), ("box", 0),
                           point=[0.32, 0.25, 0.15])
    return host, cfg


@pytest.mark.parametrize("solver,bound", [
    (Solver.SEMI_IMPLICIT_EULER, 1e-6),
    (Solver.VERLET, 5e-4),
    (Solver.XPBD, 1e-4),
])
def test_f64_exact_parity_joints(solver, bound):
    """Device coupled step with the full joint graph == oracle to f64
    rounding on every body plane (cloth, balls, box, quats)."""
    jax.config.update("jax_enable_x64", True)
    host, cfg = _jointed_scene(solver)
    top, state = api.init(host, dtype=jnp.float64)
    rigid = make_rigid_state(top, [0.3, 0.2], box_masses=[0.4],
                             box_omega=[[0.2, -0.1, 0.3]])
    x = host.positions0.copy()
    v = np.zeros_like(x)
    xp = x.copy()
    rc = np.asarray(host.sphere_centers, np.float64)
    rv = np.zeros_like(rc)
    rom = np.zeros_like(rc)
    rim = np.asarray([1.0 / 0.3, 1.0 / 0.2])
    boxes = (np.asarray(host.box_centers, np.float64), np.zeros((1, 3)),
             np.array([[0.2, -0.1, 0.3]]),
             np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (1, 1)),
             np.asarray([1.0 / 0.4]))
    rq = None
    for _ in range(30):
        out = oracle.step_coupled(host, cfg, x, v, xp, rc, rv, rim,
                                  romega=rom, rq=rq, boxes=boxes)
        x, v, xp, rc, rv, rom, rq = out[:7]
        boxes = out[-1]
        state, rigid = api.step_coupled(top, cfg, state, rigid)
    assert np.max(np.abs(np.asarray(state.x) - x)) < bound
    assert np.max(np.abs(np.asarray(rigid.centers) - rc)) < bound
    assert np.max(np.abs(np.asarray(rigid.quat) - rq)) < bound
    assert np.max(np.abs(np.asarray(rigid.box_centers) - boxes[0])) < bound
    assert np.max(np.abs(np.asarray(rigid.box_omega) - boxes[2])) \
        < 960 * bound
    assert np.max(np.abs(np.asarray(rigid.box_quat) - boxes[3])) < bound


def test_world_ball_joint_pendulum():
    """A ball anchored to a world point swings on a fixed-radius arc:
    the body-frame anchor stays welded to the world point."""
    cfg = SimConfig(collision=CollisionParams(enable_plane=False,
                                              enable_spheres=True))
    host = _far_cloth(cfg, [[0.0, 0.0, 0.0]], [0.05])
    anchor = np.array([0.0, 0.15, 0.0])
    host = add_rigid_joint(host, ("sphere", 0), None, point=anchor)
    top, state = api.init(host)
    rigid = make_rigid_state(top, [0.2], velocities=[[0.5, 0.0, 0.0]])
    for _ in range(60):
        state, rigid = api.step_coupled(top, cfg, state, rigid)
        c = np.asarray(rigid.centers[0])
        q = np.asarray(rigid.quat[0])
        # the welded point rides the orientation: c + R(q) local == anchor
        local = anchor  # build-pose local anchor (point - center0)
        p = c + oracle._quat_rotate(q.astype(np.float64), local)
        assert np.linalg.norm(p - anchor) < 2e-3
    # it actually swings
    assert abs(np.asarray(rigid.centers)[0, 0]) > 0.01


def test_distance_rod_and_spring():
    """compliance=0 keeps the rod length through a swing; compliance>0
    stretches under the hanging load (and more for larger alpha)."""
    lengths = {}
    for alpha in (0.0, 5e-3):
        cfg = SimConfig(collision=CollisionParams(enable_plane=False,
                                                  enable_spheres=True))
        host = _far_cloth(cfg, [[0.0, 0.0, 0.0], [0.25, 0.0, 0.0]],
                          [0.05, 0.04])
        host = add_rigid_joint(host, ("sphere", 0), None, point=[0, 0, 0])
        host = add_rigid_joint(host, ("sphere", 0), ("sphere", 1),
                               kind="distance", compliance=alpha)
        top, state = api.init(host)
        rigid = make_rigid_state(top, [np.inf, 0.3])  # ball0 kinematic
        for _ in range(90):
            state, rigid = api.step_coupled(top, cfg, state, rigid)
        rcs = np.asarray(rigid.centers)
        lengths[alpha] = float(np.linalg.norm(rcs[1] - rcs[0]))
    assert abs(lengths[0.0] - 0.25) < 2e-3          # rigid rod
    assert lengths[5e-3] > 0.25 + 1e-3              # spring stretches


def test_hinged_door_swings_on_axis():
    """A box hinged to the world swings about the hinge axis only: the
    axis stays aligned, the hinge point stays fixed, the door rotates."""
    cfg = SimConfig(collision=CollisionParams(enable_plane=False,
                                              enable_spheres=True,
                                              enable_boxes=True))
    host = _far_cloth(cfg, [[9.0, 9.0, 9.0]], [0.01])
    host = add_colliders(host, box_centers=[[0.2, 0.5, 0.0]],
                         box_half_extents=[[0.2, 0.3, 0.02]],
                         box_rotations=[np.eye(3)])
    hinge_pt = np.array([0.0, 0.5, 0.0])
    host = add_rigid_joint(host, ("box", 0), None, point=hinge_pt,
                           axis=[0.0, 1.0, 0.0])
    top, state = api.init(host)
    rigid = make_rigid_state(top, [0.0],  # kinematic far ball
                             box_masses=[0.5],
                             box_velocities=[[0.0, 0.0, 0.6]])
    for _ in range(90):
        state, rigid = api.step_coupled(top, cfg, state, rigid)
    bq = np.asarray(rigid.box_quat[0], np.float64)
    bc = np.asarray(rigid.box_centers[0], np.float64)
    R = oracle._quat_to_matrix(bq)
    axis_w = R @ np.array([0.0, 1.0, 0.0])
    assert np.linalg.norm(np.cross(axis_w, [0.0, 1.0, 0.0])) < 2e-3
    p_hinge = bc + R @ np.array([-0.2, 0.0, 0.0])
    assert np.linalg.norm(p_hinge - hinge_pt) < 2e-3
    assert abs(bc[2]) > 0.02                        # it swung


def test_ball_joint_conserves_momentum():
    """Two free dynamic balls joined by a ball joint, zero gravity: the
    joint impulses are internal — linear momentum exact, total angular
    momentum (orbital + spin) bounded."""
    cfg = SimConfig(gravity=(0.0, 0.0, 0.0),
                    collision=CollisionParams(enable_plane=False,
                                              enable_spheres=True))
    host = _far_cloth(cfg, [[0.0, 0.0, 0.0], [0.2, 0.0, 0.0]],
                      [0.05, 0.05])
    host = add_rigid_joint(host, ("sphere", 0), ("sphere", 1),
                           point=[0.1, 0.0, 0.0])
    top, state = api.init(host)
    m = np.array([0.3, 0.2])
    v0 = np.array([[0.0, 0.4, 0.0], [0.0, -0.3, 0.2]])
    rigid = make_rigid_state(top, m, velocities=v0)

    def momenta(r):
        rcs = np.asarray(r.centers, np.float64)
        rvs = np.asarray(r.velocities, np.float64)
        oms = np.asarray(r.omega, np.float64)
        radii = np.asarray(host.sphere_radii, np.float64)
        inertia = 0.4 * m * radii ** 2
        lin = (m[:, None] * rvs).sum(0)
        ang = (np.cross(rcs, m[:, None] * rvs)
               + inertia[:, None] * oms).sum(0)
        return lin, ang

    lin0, ang0 = momenta(rigid)
    for _ in range(60):
        state, rigid = api.step_coupled(top, cfg, state, rigid)
    lin1, ang1 = momenta(rigid)
    assert np.max(np.abs(lin1 - lin0)) < 1e-5
    assert np.max(np.abs(ang1 - ang0)) < 2e-3
    # and the link held
    rcs = np.asarray(rigid.centers)
    assert abs(np.linalg.norm(rcs[1] - rcs[0]) - 0.2) < 2e-3


def test_merge_bodies_offsets_joints():
    """Joint body refs survive merge_bodies with per-kind offsets."""
    cfg = SimConfig(collision=CollisionParams(enable_spheres=True,
                                              enable_boxes=True))
    a = _far_cloth(cfg, [[0.0, 0.0, 0.0]], [0.05], origin=(50.0, 0, 0))
    a = add_rigid_joint(a, ("sphere", 0), None, point=[0.0, 0.1, 0.0])
    b = _far_cloth(cfg, [[1.0, 0.0, 0.0]], [0.05], origin=(60.0, 0, 0))
    b = add_colliders(b, box_centers=[[1.5, 0.0, 0.0]],
                      box_half_extents=[[0.1, 0.1, 0.1]],
                      box_rotations=[np.eye(3)])
    b = add_rigid_joint(b, ("sphere", 0), ("box", 0), point=[1.2, 0, 0])
    merged = merge_bodies(a, b)
    assert merged.joint_meta == (
        ("ball", "sphere", 0, "world", 0),
        ("ball", "sphere", 1, "box", 0),
    )
    assert merged.joint_local_a.shape == (2, 3)
    # and the merged scene steps
    top, state = api.init(merged)
    rigid = make_rigid_state(top, [0.2, 0.2], box_masses=[0.3])
    state, rigid = api.step_coupled(top, cfg, state, rigid)
    assert bool(jnp.isfinite(state.x).all())
    assert bool(jnp.isfinite(rigid.box_quat).all())


def test_joint_builder_validation():
    cfg = SimConfig()
    host = _far_cloth(cfg, [[0.0, 0.0, 0.0]], [0.05])
    with pytest.raises(ValueError, match="out of range"):
        add_rigid_joint(host, ("sphere", 3), None, point=[0, 0, 0])
    with pytest.raises(ValueError, match="box id"):
        add_rigid_joint(host, ("box", 0), None, point=[0, 0, 0])
    with pytest.raises(ValueError, match="body_a must be a rigid body"):
        add_rigid_joint(host, None, ("sphere", 0), point=[0, 0, 0])
    with pytest.raises(ValueError, match="anchor"):
        add_rigid_joint(host, ("sphere", 0), None)
    with pytest.raises(ValueError, match="axis must be nonzero"):
        add_rigid_joint(host, ("sphere", 0), None, point=[0, 0, 0],
                        axis=[0, 0, 0])
    with pytest.raises(ValueError, match="point_b"):
        add_rigid_joint(host, ("sphere", 0), None, kind="distance")
    # box-side joints need promoted boxes at step time
    host2 = add_colliders(host, box_centers=[[0.3, 0.0, 0.0]],
                          box_half_extents=[[0.1, 0.1, 0.1]],
                          box_rotations=[np.eye(3)])
    host2 = add_rigid_joint(host2, ("sphere", 0), ("box", 0),
                            point=[0.15, 0.0, 0.0])
    cfg2 = dataclasses.replace(
        cfg, collision=dataclasses.replace(cfg.collision,
                                           enable_spheres=True,
                                           enable_boxes=True))
    top, state = api.init(host2)
    rigid = make_rigid_state(top, [0.2])          # no box promotion
    with pytest.raises(ValueError, match="box-side rigid joints"):
        api.step_coupled(top, cfg2, state, rigid)


def test_jointed_scene_vmaps():
    """The full joint graph vmaps over batched scenes (shared topology)."""
    host, cfg = _jointed_scene(Solver.SEMI_IMPLICIT_EULER)
    top, state = api.init(host)
    rigid = make_rigid_state(top, [0.3, 0.2], box_masses=[0.4])
    B = 3
    states = jax.tree.map(lambda a: jnp.stack([a] * B), state)
    rigids = jax.tree.map(lambda a: jnp.stack([a] * B), rigid)
    from softbodyunity_tpu.solver.rigid import step_coupled_scan

    sb_, rb_ = jax.jit(jax.vmap(
        lambda s, r: step_coupled_scan(top, cfg, s, r, cfg.dt, 2)
    ))(states, rigids)
    assert sb_.x.shape == (B,) + state.x.shape
    assert bool(jnp.isfinite(sb_.x).all())
    assert bool(jnp.isfinite(rb_.box_quat).all())
    # batch of identical scenes == single scene
    s1, r1 = step_coupled_scan(top, cfg, state, rigid, cfg.dt, 2)
    np.testing.assert_allclose(np.asarray(sb_.x[0]), np.asarray(s1.x),
                               rtol=0, atol=1e-6)


def _hinged_rod(cfg_kw=None, **joint_kw):
    cfg = SimConfig(gravity=(0.0, 0.0, 0.0),
                    collision=CollisionParams(enable_plane=False,
                                              enable_spheres=True,
                                              enable_boxes=True),
                    **(cfg_kw or {}))
    host = _far_cloth(cfg, [[9.0, 9.0, 9.0]], [0.01])
    host = add_colliders(host, box_centers=[[0.2, 0.0, 0.0]],
                         box_half_extents=[[0.2, 0.05, 0.05]],
                         box_rotations=[np.eye(3)])
    host = add_rigid_joint(host, ("box", 0), None, point=[0.0, 0.0, 0.0],
                           axis=[0.0, 1.0, 0.0], **joint_kw)
    return host, cfg


def _hinge_angle_y(bq):
    R = oracle._quat_to_matrix(np.asarray(bq, np.float64))
    return float(np.arctan2(-R[2, 0], R[0, 0]))


def test_hinge_motor_reaches_target():
    """A motorized world hinge spins the rod up to the target angular
    velocity (and not past it): Unity HingeJoint useMotor."""
    host, cfg = _hinged_rod(motor_speed=2.0, motor_max_torque=0.05)
    top, state = api.init(host)
    rigid = make_rigid_state(top, [0.0], box_masses=[0.4])
    speeds = []
    for _ in range(150):
        state, rigid = api.step_coupled(top, cfg, state, rigid)
        speeds.append(float(rigid.box_omega[0, 1]))
    assert abs(speeds[-1] - 2.0) < 1e-3
    assert max(speeds) < 2.0 + 1e-3          # never overshoots
    assert speeds[5] < speeds[40]            # torque-limited spin-up


def test_hinge_limit_respected():
    """A spun rod on a limited hinge never passes the angle limits and
    sheds its energy at the stop (near-inelastic bounce)."""
    host, cfg = _hinged_rod(limits=(-0.2, 0.5))
    top, state = api.init(host)
    rigid = make_rigid_state(top, [0.0], box_masses=[0.4],
                             box_omega=[[0.0, 3.0, 0.0]])
    max_theta = -np.inf
    for _ in range(150):
        state, rigid = api.step_coupled(top, cfg, state, rigid)
        max_theta = max(max_theta, _hinge_angle_y(rigid.box_quat[0]))
    # one substep of intrusion at most (limit projection is per-substep)
    assert max_theta < 0.5 + 3.0 * cfg.dt / cfg.n_substeps + 1e-3
    assert abs(float(rigid.box_omega[0, 1])) < 1.0   # energy shed


def test_hinge_limit_motor_parity():
    """Limits + motor: device == oracle.  The limit stop is a threshold
    gate (like every contact), so one-substep flips at the boundary are
    expected — the bound is the loose contact-tier one."""
    jax.config.update("jax_enable_x64", True)
    host, cfg = _hinged_rod(limits=(-0.2, 0.5), motor_speed=1.5,
                            motor_max_torque=0.3)
    top, state = api.init(host, dtype=jnp.float64)
    rigid = make_rigid_state(top, [0.0], box_masses=[0.4])
    x = host.positions0.copy()
    v = np.zeros_like(x)
    xp = x.copy()
    rc = np.asarray(host.sphere_centers, np.float64)
    rv = np.zeros_like(rc)
    rom = np.zeros_like(rc)
    boxes = (np.asarray(host.box_centers, np.float64), np.zeros((1, 3)),
             np.zeros((1, 3)), np.tile([1.0, 0.0, 0.0, 0.0], (1, 1)),
             np.asarray([1.0 / 0.4]))
    for _ in range(60):
        out = oracle.step_coupled(host, cfg, x, v, xp, rc, rv,
                                  np.asarray([0.0]), romega=rom,
                                  boxes=boxes)
        x, v, xp, rc, rv, rom = out[:6]
        boxes = out[-1]
        state, rigid = api.step_coupled(top, cfg, state, rigid)
    assert np.max(np.abs(np.asarray(rigid.box_quat) - boxes[3])) < 1e-3
    assert np.max(np.abs(np.asarray(rigid.box_omega) - boxes[2])) < 5e-2


def test_limit_motor_builder_validation():
    cfg = SimConfig()
    host = _far_cloth(cfg, [[0.0, 0.0, 0.0]], [0.05])
    with pytest.raises(ValueError, match="hinge joints only"):
        add_rigid_joint(host, ("sphere", 0), None, point=[0, 0, 0],
                        limits=(-1.0, 1.0))
    with pytest.raises(ValueError, match="motor_max_torque"):
        add_rigid_joint(host, ("sphere", 0), None, point=[0, 0, 0],
                        axis=[0, 1, 0], motor_speed=1.0)
    with pytest.raises(ValueError, match="lo <= hi"):
        add_rigid_joint(host, ("sphere", 0), None, point=[0, 0, 0],
                        axis=[0, 1, 0], limits=(1.0, -1.0))
