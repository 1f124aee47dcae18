"""Dynamic rigid boxes — the scene's oriented boxes promoted to rigid
bodies (solver/rigid.py box twins; oracle "dynamic rigid boxes" section
is the binding semantics): cloth<->box exchange, box-plane corner
bounce, solid-box inertia, orientation quaternions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import softbodyunity_tpu as sb
from softbodyunity_tpu import api
from softbodyunity_tpu.core.config import CollisionParams, SimConfig, Solver
from softbodyunity_tpu.core.topology import add_colliders, cloth_grid
from softbodyunity_tpu.oracle import reference as oracle
from softbodyunity_tpu.solver.rigid import make_rigid_state


@pytest.fixture(autouse=True)
def _restore_x64():
    prev = jax.config.jax_enable_x64
    yield
    jax.config.update("jax_enable_x64", prev)


def _tilt(angle=0.3):
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _crate_scene(solver, mass=0.08, rot0=None, with_sphere=True,
                 box_y=0.35, restitution=0.3):
    """Trampoline cloth + a crate above it (+ optionally a ball), plane
    below everything."""
    cfg = SimConfig(
        solver=solver,
        springs=sb.SpringParams(k_structural=2000.0, k_shear=1000.0,
                                k_bend=400.0, damping=1.5),
        collision=CollisionParams(enable_plane=True, enable_spheres=True,
                                  enable_boxes=True,
                                  restitution=restitution, friction=0.4),
        global_damping=0.5,
    )
    sc = [[0.3, 0.6, 0.3]] if with_sphere else [[9.0, 9.0, 9.0]]
    sr = [0.08] if with_sphere else [0.01]
    host = cloth_grid(
        10, 10, spacing=0.1, mass=mass,
        pinned=("top", "bottom", "left", "right"),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-1.0,
        orientation="xz", origin=(-0.45, 0.0, -0.45),
        sphere_centers=sc, sphere_radii=sr)
    host = add_colliders(
        host, box_centers=[[0.0, box_y, 0.0]],
        box_half_extents=[[0.12, 0.08, 0.10]],
        box_rotations=[np.eye(3) if rot0 is None else rot0])
    return host, cfg


@pytest.mark.parametrize("solver,bound", [
    (Solver.SEMI_IMPLICIT_EULER, 1e-6),
    (Solver.VERLET, 5e-4),
    (Solver.XPBD, 1e-4),
])
def test_f64_exact_parity_boxes(solver, bound):
    """Device coupled step with a dynamic crate (+ ball) == oracle to f64
    rounding: cloth, box center/velocity/omega/quat, ball state."""
    jax.config.update("jax_enable_x64", True)
    rot0 = _tilt(0.3)
    host, cfg = _crate_scene(solver, rot0=rot0)
    top, state = api.init(host, dtype=jnp.float64)
    rigid = make_rigid_state(top, [0.4], box_masses=[0.5],
                             box_omega=[[0.5, 0.2, -0.3]])
    x = host.positions0.copy()
    v = np.zeros_like(x)
    xp = x.copy()
    rc = np.asarray(host.sphere_centers, np.float64)
    rv = np.zeros_like(rc)
    rom = np.zeros_like(rc)
    rim = np.asarray([1.0 / 0.4])
    boxes = (np.asarray(host.box_centers, np.float64), np.zeros((1, 3)),
             np.array([[0.5, 0.2, -0.3]]),
             np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (1, 1)),
             np.asarray([1.0 / 0.5]))
    for _ in range(30):
        out = oracle.step_coupled(host, cfg, x, v, xp, rc, rv, rim,
                                  romega=rom, boxes=boxes)
        x, v, xp, rc, rv, rom = out[:6]
        boxes = out[-1]
        state, rigid = api.step_coupled(top, cfg, state, rigid)
    assert np.max(np.abs(np.asarray(state.x) - x)) < bound
    assert np.max(np.abs(np.asarray(rigid.box_centers) - boxes[0])) < bound
    assert np.max(np.abs(np.asarray(rigid.box_velocities) - boxes[1])) \
        < 960 * bound
    assert np.max(np.abs(np.asarray(rigid.box_omega) - boxes[2])) \
        < 960 * bound
    assert np.max(np.abs(np.asarray(rigid.box_quat) - boxes[3])) < bound
    assert np.max(np.abs(np.asarray(rigid.centers) - rc)) < bound


@pytest.mark.parametrize("solver", [
    Solver.SEMI_IMPLICIT_EULER, Solver.VERLET, Solver.XPBD])
def test_crate_caught_by_trampoline(solver):
    """A 0.5 kg crate dropped on a pinned-edge cloth is caught well above
    the floor and settles."""
    host, cfg = _crate_scene(solver, with_sphere=False)
    top, state = api.init(host)
    r = make_rigid_state(top, [np.inf], box_masses=[0.5])
    step = jax.jit(lambda s, r: sb.step_coupled(top, cfg, s, r))
    for _ in range(300):
        state, r = step(state, r)
    bc = np.asarray(r.box_centers)[0]
    bv = np.asarray(r.box_velocities)[0]
    assert np.isfinite(np.asarray(state.x)).all()
    assert -0.6 < bc[1] < 0.1, bc
    assert np.linalg.norm(bv) < 0.3, bv


def test_tilted_crate_settles_flat_on_plane():
    """A tilted crate dropped on the bare plane tumbles onto a face and
    comes to rest half-extent above the plane, via the corner-impulse
    bounce (torque from off-center corner contacts rights it)."""
    rot0 = _tilt(0.4)
    cfg = SimConfig(
        collision=CollisionParams(enable_plane=True, enable_spheres=True,
                                  enable_boxes=True,
                                  restitution=0.2, friction=0.5))
    host = cloth_grid(4, 4, spacing=0.05, pinned=("top",),
                      origin=(5.0, 5.0, 5.0),
                      springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-1.0,
                      orientation="xz",
                      sphere_centers=[[8.0, 5.0, 5.0]], sphere_radii=[0.01])
    host = add_colliders(host, box_centers=[[0.0, -0.3, 0.0]],
                         box_half_extents=[[0.12, 0.08, 0.10]],
                         box_rotations=[rot0])
    top, state = api.init(host)
    r = make_rigid_state(top, [np.inf], box_masses=[0.5])
    step = jax.jit(lambda s, r: sb.step_coupled(top, cfg, s, r))
    for _ in range(500):
        state, r = step(state, r)
    bc = np.asarray(r.box_centers)[0]
    bv = np.asarray(r.box_velocities)[0]
    bq = np.asarray(r.box_quat)[0]
    R = np.asarray(oracle._quat_to_matrix(bq)) @ rot0
    up = np.abs(R[1, :])
    assert -1.0 < bc[1] < -0.85, bc       # resting a half-extent above
    assert np.linalg.norm(bv) < 0.2, bv
    assert up.max() > 0.97, up            # flat on SOME face
    assert abs(np.linalg.norm(bq) - 1.0) < 1e-5


def test_xpbd_heavy_cloth_stays_bounded():
    """The in-loop reaction regression: a light crate AND a light ball
    under a 1 kg/vertex cloth (patch ~20x the body mass) stay at
    free-fall velocity scale under XPBD.  End-of-substep accumulation of
    the per-iteration projection impulses launched the ball at ~5 m/s
    and the crate at ~10 m/s within 150 frames."""
    host, cfg = _crate_scene(Solver.XPBD, mass=1.0)
    top, state = api.init(host)
    r = make_rigid_state(top, [0.4], box_masses=[0.5])
    step = jax.jit(lambda s, r: sb.step_coupled(top, cfg, s, r))
    vmax = 0.0
    for _ in range(150):
        state, r = step(state, r)
        vmax = max(vmax, float(np.abs(np.asarray(r.box_velocities)).max()),
                   float(np.abs(np.asarray(r.velocities)).max()))
    assert np.isfinite(np.asarray(state.x)).all()
    assert vmax < 6.0, vmax
    assert np.asarray(r.box_centers)[0, 1] > -0.95
    assert np.asarray(r.centers)[0, 1] > -0.95


@pytest.mark.parametrize("solver", [
    Solver.SEMI_IMPLICIT_EULER, Solver.VERLET, Solver.XPBD])
def test_kinematic_box_matches_static_scene(solver):
    """A kinematic dynamic box (inf mass, zero velocity/spin) reproduces
    the plain step's static-box trajectory: beta = 1 and zero surface
    velocity make the coupled box loop collapse to the static rule.
    Not bitwise — the coupled form computes ``v0 + beta*(v_t - v0)``
    which differs from ``v_t`` by ulps even at beta = 1, and 40 frames
    of contact amplify that to ~1e-7 (a semantic mismatch reads 1e-2+)."""
    jax.config.update("jax_enable_x64", True)
    host, cfg = _crate_scene(solver, with_sphere=False, box_y=-0.25)
    top, state0 = api.init(host, dtype=jnp.float64)
    r = make_rigid_state(top, [np.inf], box_masses=[np.inf])
    sc = state0
    st = state0
    for _ in range(40):
        sc, r = api.step_coupled(top, cfg, sc, r)
        st = api.step(top, cfg, st)
    assert np.max(np.abs(np.asarray(sc.x) - np.asarray(st.x))) < 1e-5
    np.testing.assert_allclose(np.asarray(r.box_centers),
                               np.asarray(host.box_centers))


def test_make_rigid_state_box_validation():
    host, cfg = _crate_scene(Solver.SEMI_IMPLICIT_EULER)
    top, _ = api.init(host)
    with pytest.raises(ValueError, match="box count"):
        make_rigid_state(top, [0.4], box_masses=[1.0, 2.0])
    host2, cfg2 = SimConfig(), None
    h = cloth_grid(4, 4, spacing=0.1, pinned=(),
                   springs=host2.springs, xpbd=host2.xpbd,
                   sphere_centers=[[0.0, -9.0, 0.0]], sphere_radii=[0.1])
    top2, _ = api.init(h)
    with pytest.raises(ValueError, match="no boxes"):
        make_rigid_state(top2, [0.4], box_masses=[1.0])
    with pytest.raises(ValueError, match="masses"):
        make_rigid_state(top2)        # scene HAS spheres: masses required
    r = make_rigid_state(top, [0.4], box_masses=[1.0])
    cfg_off = SimConfig(collision=CollisionParams(
        enable_plane=True, enable_spheres=True, enable_boxes=False))
    _, state = api.init(host)
    with pytest.raises(ValueError, match="enable_boxes"):
        api.step_coupled(top, cfg_off, state, r)


def test_boxes_only_scene_no_spheres():
    """A sphere-free scene couples a crate to cloth (masses=None path):
    the crate is caught by the trampoline."""
    cfg = SimConfig(
        springs=sb.SpringParams(k_structural=2000.0, k_shear=1000.0,
                                k_bend=400.0, damping=1.5),
        collision=CollisionParams(enable_plane=True, enable_boxes=True,
                                  restitution=0.2, friction=0.4),
        global_damping=0.5)
    host = cloth_grid(10, 10, spacing=0.1, mass=0.08,
                      pinned=("top", "bottom", "left", "right"),
                      springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-1.0,
                      orientation="xz", origin=(-0.45, 0.0, -0.45))
    host = add_colliders(host, box_centers=[[0.0, 0.3, 0.0]],
                         box_half_extents=[[0.1, 0.08, 0.1]],
                         box_rotations=[np.eye(3)])
    top, state = api.init(host)
    r = make_rigid_state(top, box_masses=[0.5])
    assert r.centers.shape == (0, 3)
    step = jax.jit(lambda s, r: sb.step_coupled(top, cfg, s, r))
    for _ in range(200):
        state, r = step(state, r)
    bc = np.asarray(r.box_centers)[0]
    assert -0.6 < bc[1] < 0.1, bc
    assert np.isfinite(np.asarray(state.x)).all()


def _stack_scene(solver):
    """Bare plane + two stacked crates + a ball dropped on top (cloth
    parked far away): exercises box-plane, box-box, and ball-box."""
    cfg = SimConfig(
        solver=solver,
        collision=CollisionParams(enable_plane=True, enable_spheres=True,
                                  enable_boxes=True,
                                  restitution=0.1, friction=0.5))
    host = cloth_grid(4, 4, spacing=0.05, pinned=("top",),
                      origin=(9.0, 9.0, 9.0),
                      springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-1.0,
                      orientation="xz",
                      sphere_centers=[[0.02, 0.15, 0.01]],
                      sphere_radii=[0.07])
    host = add_colliders(
        host,
        box_centers=[[0.0, -0.6, 0.0], [0.01, -0.25, 0.02]],
        box_half_extents=[[0.15, 0.10, 0.15], [0.10, 0.08, 0.10]],
        box_rotations=[np.eye(3), np.eye(3)])
    return host, cfg


@pytest.mark.parametrize("solver,bound", [
    (Solver.SEMI_IMPLICIT_EULER, 1e-6),
    (Solver.VERLET, 5e-4),
    (Solver.XPBD, 1e-4),
])
def test_f64_exact_parity_stack(solver, bound):
    """Device crate-stack trajectory (box-plane + box-box + ball-box
    contacts) == oracle to f64 rounding."""
    jax.config.update("jax_enable_x64", True)
    host, cfg = _stack_scene(solver)
    top, state = api.init(host, dtype=jnp.float64)
    rigid = make_rigid_state(top, [0.2], box_masses=[0.8, 0.4])
    x = host.positions0.copy()
    v = np.zeros_like(x)
    xp = x.copy()
    rc = np.asarray(host.sphere_centers, np.float64)
    rv = np.zeros_like(rc)
    rom = np.zeros_like(rc)
    rim = np.asarray([1.0 / 0.2])
    boxes = (np.asarray(host.box_centers, np.float64), np.zeros((2, 3)),
             np.zeros((2, 3)),
             np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (2, 1)),
             np.asarray([1.0 / 0.8, 1.0 / 0.4]))
    for _ in range(60):
        out = oracle.step_coupled(host, cfg, x, v, xp, rc, rv, rim,
                                  romega=rom, boxes=boxes)
        x, v, xp, rc, rv, rom = out[:6]
        boxes = out[-1]
        state, rigid = api.step_coupled(top, cfg, state, rigid)
    assert np.max(np.abs(np.asarray(rigid.box_centers) - boxes[0])) < bound
    assert np.max(np.abs(np.asarray(rigid.centers) - rc)) < bound
    assert np.max(np.abs(np.asarray(rigid.box_quat) - boxes[3])) < bound


def test_rigid_stack_rests():
    """plane <- crate <- crate <- ball: every body settles at its exact
    rest height (corner-impulse box-plane, corner-vs-face box-box,
    closest-point ball-box)."""
    host, cfg = _stack_scene(Solver.SEMI_IMPLICIT_EULER)
    top, state = api.init(host)
    r = make_rigid_state(top, [0.2], box_masses=[0.8, 0.4])
    step = jax.jit(lambda s, r: sb.step_coupled(top, cfg, s, r))
    for _ in range(500):
        state, r = step(state, r)
    bc = np.asarray(r.box_centers)
    rc = np.asarray(r.centers)
    assert -1.0 < bc[0, 1] < -0.88, bc[0]     # plane_h + half_y
    assert -0.78 < bc[1, 1] < -0.66, bc[1]    # bottom top + half_y
    assert -0.62 < rc[0, 1] < -0.48, rc[0]    # top crate top + radius
    assert np.abs(np.asarray(r.box_velocities)).max() < 0.3
    assert np.abs(np.asarray(r.velocities)).max() < 0.3


def test_box_box_head_on_exchange():
    """Two equal crates, one sliding into the other on a frictionless
    plane-free axis: momentum is conserved and the hit crate moves."""
    cfg = SimConfig(
        collision=CollisionParams(enable_plane=False, enable_spheres=True,
                                  enable_boxes=True,
                                  restitution=0.5, friction=0.0),
        gravity=(0.0, 0.0, 0.0))
    host = cloth_grid(4, 4, spacing=0.05, pinned=("top",),
                      origin=(9.0, 9.0, 9.0),
                      springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-9.0,
                      orientation="xz",
                      sphere_centers=[[9.0, 0.0, 9.0]], sphere_radii=[0.01])
    # the target crate is slightly larger in y/z: corner-vs-face contact
    # needs the corners strictly inside the other box's face slab
    # (perfectly flush identical faces are a measure-zero degenerate
    # alignment the corner manifold cannot see)
    host = add_colliders(
        host,
        box_centers=[[0.0, 0.0, 0.0], [0.35, 0.0, 0.0]],
        box_half_extents=[[0.1, 0.1, 0.1], [0.1, 0.12, 0.12]],
        box_rotations=[np.eye(3), np.eye(3)])
    top, state = api.init(host)
    r = make_rigid_state(top, [np.inf], box_masses=[0.5, 0.5],
                         box_velocities=[[2.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    step = jax.jit(lambda s, r: sb.step_coupled(top, cfg, s, r))
    for _ in range(60):
        state, r = step(state, r)
    bv = np.asarray(r.box_velocities)
    # total momentum conserved along x
    assert abs(bv[:, 0].sum() - 2.0) < 1e-3, bv
    # the hit crate took most of the motion
    assert bv[1, 0] > 1.0, bv
    assert np.isfinite(np.asarray(r.box_quat)).all()


def _strap_crate(solver=Solver.SEMI_IMPLICIT_EULER):
    """Vertical cloth strap pinned at the top, a crate welded below by a
    TOP CORNER (off-center: the weld transmits torque and the crate
    swings/spins)."""
    cfg = SimConfig(
        solver=solver,
        springs=sb.SpringParams(k_structural=1500.0, k_shear=800.0,
                                k_bend=200.0, damping=1.0),
        collision=CollisionParams(enable_plane=False, enable_boxes=True,
                                  friction=0.3),
        global_damping=0.4)
    host = cloth_grid(3, 8, spacing=0.05, mass=0.04, pinned=("top",),
                      springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-5.0,
                      orientation="xy")
    host = add_colliders(host, box_centers=[[0.05, -0.5, 0.0]],
                         box_half_extents=[[0.06, 0.04, 0.05]],
                         box_rotations=[np.eye(3)])
    vid = int(np.argmin(np.linalg.norm(
        host.positions0 - np.array([0.05, -0.35, 0.0]), axis=1)))
    from softbodyunity_tpu.core.topology import attach_box
    host = attach_box(host, [vid], [0],
                      points=[[0.11, -0.46, 0.05]])   # crate top corner
    return host, cfg, vid


@pytest.mark.parametrize("solver,bound", [
    (Solver.SEMI_IMPLICIT_EULER, 1e-6),
    (Solver.VERLET, 5e-4),
    (Solver.XPBD, 1e-4),
])
def test_f64_exact_parity_box_attach(solver, bound):
    """Device corner-welded crate trajectory == oracle, all solvers
    (center, velocity, omega AND orientation quaternion)."""
    jax.config.update("jax_enable_x64", True)
    host, cfg, vid = _strap_crate(solver)
    top, state = api.init(host, dtype=jnp.float64)
    rigid = make_rigid_state(top, box_masses=[0.3])
    x = host.positions0.copy()
    v = np.zeros_like(x)
    xp = x.copy()
    rc = np.zeros((0, 3))
    rv = np.zeros((0, 3))
    rim = np.zeros((0,))
    boxes = (np.asarray(host.box_centers, np.float64), np.zeros((1, 3)),
             np.zeros((1, 3)),
             np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (1, 1)),
             np.asarray([1.0 / 0.3]))
    for _ in range(25):
        out = oracle.step_coupled(host, cfg, x, v, xp, rc, rv, rim,
                                  boxes=boxes)
        x, v, xp = out[:3]
        boxes = out[-1]
        state, rigid = api.step_coupled(top, cfg, state, rigid)
    assert np.max(np.abs(np.asarray(state.x) - x)) < bound
    assert np.max(np.abs(np.asarray(rigid.box_centers) - boxes[0])) < bound
    assert np.max(np.abs(np.asarray(rigid.box_quat) - boxes[3])) < bound
    assert np.max(np.abs(np.asarray(rigid.box_omega) - boxes[2])) \
        < 960 * bound
    # the weld actually torques: the crate picked up real spin
    assert np.linalg.norm(boxes[2][0]) > 1.0


def test_box_weld_holds_and_stays_stable():
    """600 frames of a corner-hung swinging crate: weld gap stays at
    rounding level, quaternion unit, energy bounded (no Gauss-Seidel
    pumping)."""
    host, cfg, vid = _strap_crate()
    top, state = api.init(host)
    r = make_rigid_state(top, box_masses=[0.3])
    step = jax.jit(lambda s, r: sb.step_coupled(top, cfg, s, r))
    for _ in range(600):
        state, r = step(state, r)
    bc = np.asarray(r.box_centers)[0]
    bom = np.asarray(r.box_omega)[0]
    bq = np.asarray(r.box_quat)[0]
    rot = np.asarray(oracle._quat_to_matrix(bq))
    tgt = bc + rot @ np.asarray(host.attach_box_local[0])
    gap = np.linalg.norm(np.asarray(state.x)[vid] - tgt)
    assert gap < 1e-5, gap
    assert abs(np.linalg.norm(bq) - 1.0) < 1e-5
    assert np.linalg.norm(bom) < 40.0       # bounded (starts ~12 rad/s)
    assert bc[1] > -0.8                     # held by the strap


def test_kinematic_box_attach_drags_vertex():
    """w_b = 0 (inf mass): the welded vertex lands EXACTLY on the rotated
    body-frame target every substep while the scripted crate drifts and
    spins."""
    host, cfg, vid = _strap_crate()
    cfg = SimConfig(solver=cfg.solver, springs=cfg.springs,
                    collision=cfg.collision, gravity=(0.0, 0.0, 0.0),
                    global_damping=cfg.global_damping)
    top, state = api.init(host)
    r = make_rigid_state(top, box_masses=[np.inf],
                         box_velocities=[[0.2, -0.1, 0.0]],
                         box_omega=[[0.0, 2.0, 0.0]])
    step = jax.jit(lambda s, r: sb.step_coupled(top, cfg, s, r))
    for _ in range(30):
        state, r = step(state, r)
    bc = np.asarray(r.box_centers)[0]
    bq = np.asarray(r.box_quat)[0]
    rot = np.asarray(oracle._quat_to_matrix(bq))
    tgt = bc + rot @ np.asarray(host.attach_box_local[0])
    gap = np.linalg.norm(np.asarray(state.x)[vid] - tgt)
    assert gap < 1e-5, gap
    # the crate actually rotated (weld target moved around the center)
    assert abs(bq[2]) > 0.2                 # sin(theta/2) about y


def test_attach_box_validation_and_merge():
    from softbodyunity_tpu.core.topology import attach_box, merge_bodies

    host, cfg, vid = _strap_crate()
    with pytest.raises(ValueError, match="vertex id"):
        attach_box(host, [999], [0])
    with pytest.raises(ValueError, match="box id"):
        attach_box(host, [0], [5])
    m = merge_bodies(host, host)
    n = host.positions0.shape[0]
    assert list(m.attach_box_ids) == [vid, vid + n]
    assert list(m.attach_box_body) == [0, 1]
    # requires dynamic boxes on the rigid state
    top, state = api.init(host)
    r_nobox = make_rigid_state(top)
    with pytest.raises(ValueError, match="box attachments"):
        api.step_coupled(top, cfg, state, r_nobox)


def test_vmapped_batched_crates():
    """Coupled crates vmap over batched scenes (per-scene box state)."""
    host, cfg = _crate_scene(Solver.SEMI_IMPLICIT_EULER, with_sphere=False)
    top, state = api.init(host)
    r = make_rigid_state(top, [np.inf], box_masses=[0.5])
    B = 4
    bats = jax.tree_util.tree_map(
        lambda a: jnp.stack([a] * B) if a is not None else None, state)
    batr = jax.tree_util.tree_map(
        lambda a: jnp.stack([a] * B) if a is not None else None, r)
    # vary initial box heights per scene
    batr = batr.replace(box_centers=batr.box_centers.at[:, 0, 1].set(
        jnp.asarray([0.3, 0.35, 0.4, 0.45])))

    from softbodyunity_tpu.solver.rigid import step_coupled_scan

    @jax.jit
    def stepb(s, r):
        return jax.vmap(
            lambda si, ri: step_coupled_scan(top, cfg, si, ri, cfg.dt,
                                             cfg.n_substeps))(s, r)

    for _ in range(60):
        bats, batr = stepb(bats, batr)
    bc = np.asarray(batr.box_centers)[:, 0, :]
    assert np.isfinite(bc).all()
    # higher drops are still higher (or equal) mid-flight consistency:
    # all caught above the plane
    assert (bc[:, 1] > -0.9).all()
    # scenes differ (different initial conditions evolved differently)
    assert np.std(bc[:, 1]) > 1e-5


def _rod_cross_scene(top_rot):
    """A dynamic rod dropped across a kinematic rod — no corner of either
    box ever enters the other (the manifold the corner scheme misses)."""
    cfg = SimConfig(
        collision=CollisionParams(enable_plane=True, enable_spheres=True,
                                  enable_boxes=True, restitution=0.1,
                                  friction=0.3))
    host = cloth_grid(
        2, 2, spacing=0.1, pinned=("top",), springs=sb.SpringParams(),
        xpbd=cfg.xpbd, plane_height=-1.0, origin=(50.0, 0.0, 0.0),
        orientation="xy", sphere_centers=[[9.0, 9.0, 9.0]],
        sphere_radii=[0.01])
    host = add_colliders(
        host,
        box_centers=[[0.0, 0.0, 0.0], [0.0, 0.3, 0.0]],
        box_half_extents=[[0.5, 0.05, 0.05], [0.05, 0.05, 0.5]],
        box_rotations=[np.eye(3), top_rot])
    return host, cfg


@pytest.mark.parametrize("angle", [0.0, 0.7])
def test_edge_edge_crossing_rests(angle):
    """X-crossed rods: the falling rod lands ON the crossing rod via the
    SAT fallback contact (it used to fall straight through), both for the
    aligned (face-axis tie) and skewed (cross-axis) crossings; device ==
    oracle to f64 rounding."""
    jax.config.update("jax_enable_x64", True)
    c, s = np.cos(angle), np.sin(angle)
    roty = np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
    host, cfg = _rod_cross_scene(roty)
    top, state = api.init(host, dtype=jnp.float64)
    rigid = make_rigid_state(top, [0.0], box_masses=[np.inf, 0.4])
    x = host.positions0.copy()
    v = np.zeros_like(x)
    xp = x.copy()
    rc = np.asarray(host.sphere_centers, np.float64)
    rv = np.zeros_like(rc)
    rom = np.zeros_like(rc)
    rim = np.asarray([0.0])
    boxes = (np.asarray(host.box_centers, np.float64), np.zeros((2, 3)),
             np.zeros((2, 3)), np.tile([1.0, 0.0, 0.0, 0.0], (2, 1)),
             np.asarray([0.0, 1.0 / 0.4]))
    for _ in range(120):
        out = oracle.step_coupled(host, cfg, x, v, xp, rc, rv, rim,
                                  romega=rom, boxes=boxes)
        x, v, xp, rc, rv, rom = out[:6]
        boxes = out[-1]
        state, rigid = api.step_coupled(top, cfg, state, rigid)
    bc_o = boxes[0]
    assert bc_o[1][1] > 0.085, "rod fell through the crossing rod"
    assert np.max(np.abs(np.asarray(rigid.box_centers) - bc_o)) < 1e-6
    assert np.max(np.abs(np.asarray(rigid.box_quat) - boxes[3])) < 1e-6
