"""On-device two-way rigid-soft coupling (solver/rigid.py) — oracle
``substep_euler_coupled`` is the binding semantics: rigid predict, cloth
substep with per-sphere impulse measurement, momentum reaction,
rigid-plane bounce."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import softbodyunity_tpu as sb
from softbodyunity_tpu import api
from softbodyunity_tpu.core.config import CollisionParams, SimConfig, Solver
from softbodyunity_tpu.core.topology import cloth_grid
from softbodyunity_tpu.oracle import reference as oracle
from softbodyunity_tpu.solver.rigid import make_rigid_state


@pytest.fixture(autouse=True)
def _restore_x64():
    prev = jax.config.jax_enable_x64
    yield
    jax.config.update("jax_enable_x64", prev)


def _trampoline(n=10, plane=True, pinned=("top", "bottom", "left", "right")):
    cfg = SimConfig(
        springs=sb.SpringParams(k_structural=2000.0, k_shear=1000.0,
                                k_bend=400.0, damping=1.5),
        collision=CollisionParams(enable_plane=plane, enable_spheres=True,
                                  friction=0.2),
        global_damping=0.8,
    )
    host = cloth_grid(
        n, n, spacing=1.0 / (n - 1), mass=0.08, pinned=pinned,
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-2.0,
        orientation="xz",
        sphere_centers=[[0.5, 0.35, 0.5]], sphere_radii=[0.25],
    )
    return host, cfg


# f64 summation-reorder noise is amplified by contact chaos; the damping-
# free Verlet carries positional noise undamped through the sphere impact
# (measured: noise injects at first contact and WANDERS ~1e-5, shrinking
# as often as growing — no systematic growth), so its bound is looser.  A
# semantic difference would blow through all of these (compare the 1e-2+
# seen when a formula genuinely mismatches).
@pytest.mark.parametrize("solver,bound", [
    (Solver.SEMI_IMPLICIT_EULER, 1e-6),
    (Solver.VERLET, 5e-4),
    # the reduced-mass factor embeds a cross-vertex reduction
    # (m_c = sum m*contact) whose device summation order differs from
    # NumPy's by ulps; XPBD's undamped positional contact chaos amplifies
    # that to ~1e-5 after impact (measured: exact 1e-15 until the impact
    # frame, then WANDERS 1e-6..1e-5 with no growth — a genuine formula
    # mismatch jumps to 1e-2+ and grows; the i==10 pre-contact assert
    # below still pins every solver to 1e-6 exactness)
    (Solver.XPBD, 1e-4),
])
def test_f64_exact_parity_coupled(solver, bound):
    """Device coupled step == oracle step_coupled to f64 rounding, ball
    trajectory included (through impact and settling) — all three
    solvers (Euler: velocity impulses; Verlet/XPBD: projection
    impulses)."""
    jax.config.update("jax_enable_x64", True)
    host, cfg = _trampoline()
    cfg = cfg.replace(solver=solver)
    top, state = api.init(host, dtype=jnp.float64)
    rigid = make_rigid_state(top, [0.5])
    x = host.positions0.copy()
    v = np.zeros_like(x)
    xp = x.copy()
    rc = np.asarray(host.sphere_centers, np.float64)
    rv = np.zeros_like(rc)
    rom = np.zeros_like(rc)
    rim = np.asarray([2.0])
    for i in range(40):
        x, v, xp, rc, rv, rom = oracle.step_coupled(
            host, cfg, x, v, xp, rc, rv, rim, romega=rom)
        state, rigid = api.step_coupled(top, cfg, state, rigid)
        if i == 10:
            # pre-/early-contact: EVERY solver must track tightly here
            # (loose final bounds must not hide a formula mismatch)
            assert np.max(np.abs(np.asarray(state.x) - x)) < 1e-6
    assert np.max(np.abs(np.asarray(state.x) - x)) < bound
    assert np.max(np.abs(np.asarray(rigid.centers) - rc)) < bound
    # velocity noise = position reorder noise / dt (960x)
    v_bound = 2e-4 if solver == Solver.SEMI_IMPLICIT_EULER else 960 * bound
    assert np.max(np.abs(np.asarray(rigid.velocities) - rv)) < v_bound
    if solver == Solver.SEMI_IMPLICIT_EULER:
        assert np.max(np.abs(np.asarray(rigid.omega) - rom)) < 2e-3
    else:
        # radial projection exerts NO torque and the ball never touches
        # the plane in this scene: omega must stay exactly zero on both
        # sides (a sign/scale error in a spurious angular term would
        # show up here, not hide under a loose bound)
        assert np.max(np.abs(np.asarray(rigid.omega))) == 0.0
        assert np.max(np.abs(rom)) == 0.0


def test_contact_conserves_momentum():
    """With no plane/damping/pins, contact only EXCHANGES momentum: the
    cloth+ball total equals the free-fall prediction exactly (f64)."""
    jax.config.update("jax_enable_x64", True)
    cfg = SimConfig(
        springs=sb.SpringParams(k_structural=800.0, damping=0.5),
        collision=CollisionParams(enable_plane=False, enable_spheres=True,
                                  friction=0.3, restitution=0.2),
        global_damping=0.0,
    )
    n = 8
    host = cloth_grid(
        n, n, spacing=0.1, mass=0.05, pinned=(), springs=cfg.springs,
        xpbd=cfg.xpbd, plane_height=-99.0, orientation="xz",
        sphere_centers=[[0.35, 0.2, 0.35]], sphere_radii=[0.15],
    )
    top, state = api.init(host, dtype=jnp.float64)
    m_ball = 0.7
    rigid = make_rigid_state(top, [m_ball])
    # give the ball an upward+sideways kick so it punches into the cloth
    rigid = rigid.replace(velocities=jnp.asarray([[0.4, 2.0, 0.1]],
                                                 jnp.float64))
    m_cloth = 0.05 * n * n
    p0 = m_ball * np.asarray([0.4, 2.0, 0.1])
    t = 0.0
    for _ in range(12):
        state, rigid = api.step_coupled(top, cfg, state, rigid)
        t += cfg.dt * cfg.n_substeps
    p_cloth = 0.05 * np.asarray(state.v).sum(axis=0)
    p_ball = m_ball * np.asarray(rigid.velocities)[0]
    expect = p0 + np.asarray(cfg.gravity) * (m_cloth + m_ball) * t
    np.testing.assert_allclose(p_cloth + p_ball, expect, atol=1e-9)
    # and contact actually happened (the cloth picked up ball momentum)
    assert np.abs(p_cloth).max() > 1e-3


def test_ball_rests_on_trampoline():
    """The on-device coupled loop reproduces example 16's outcome: the
    ball is caught, stays above the floor, and ends nearly at rest."""
    host, cfg = _trampoline(n=16)
    top, state = api.init(host)
    rigid = make_rigid_state(top, [0.5])
    # 300 frames: the reduced-mass exchange (beta = M/(M+m_c)) transfers
    # momentum more gently than the old full-forcing rule, so settling
    # takes longer (measured |v|: 0.25 @150, 0.10 @200, 0.06 @300)
    for _ in range(300):
        state, rigid = api.step_coupled(top, cfg, state, rigid)
    c = np.asarray(rigid.centers)[0]
    vb = np.asarray(rigid.velocities)[0]
    assert np.isfinite(np.asarray(state.x)).all()
    assert c[1] > -0.8                       # caught, not on the floor
    assert np.linalg.norm(vb) < 0.2          # settled
    # cloth is dented below its rest plane under the ball
    assert np.asarray(state.x)[:, 1].min() < -0.02


def test_kinematic_sphere_matches_plain_step():
    """inv_mass = 0 (kinematic, zero velocity) must reproduce the ordinary
    step with static sphere geometry bit-for-bit."""
    host, cfg = _trampoline()
    top, state = api.init(host)
    rigid = make_rigid_state(top, [np.inf])    # kinematic
    s_plain = api.step(top, cfg, state)
    s_coupled, r2 = api.step_coupled(top, cfg, state, rigid)
    np.testing.assert_array_equal(np.asarray(s_coupled.x),
                                  np.asarray(s_plain.x))
    np.testing.assert_array_equal(np.asarray(r2.centers),
                                  np.asarray(rigid.centers))


def test_dynamic_sphere_bounces_on_plane():
    """A dynamic sphere with no cloth contact falls and bounces on the
    ground plane with the cloth's restitution rule."""
    cfg = SimConfig(
        collision=CollisionParams(enable_plane=True, enable_spheres=True,
                                  restitution=0.5, friction=0.0),
        global_damping=0.0,
    )
    host = cloth_grid(
        4, 4, spacing=0.05, pinned=("corners",), springs=cfg.springs,
        xpbd=cfg.xpbd, plane_height=0.0, orientation="xy",
        origin=(5.0, 5.0, 5.0),                 # cloth far away
        sphere_centers=[[0.0, 0.5, 0.0]], sphere_radii=[0.1],
    )
    top, state = api.init(host)
    rigid = make_rigid_state(top, [1.0])
    ys = []
    for _ in range(60):
        state, rigid = api.step_coupled(top, cfg, state, rigid)
        ys.append(float(rigid.centers[0, 1]))
    ys = np.asarray(ys)
    assert ys.min() >= 0.1 - 1e-5              # never below radius
    # first impact frame, then an upward excursion within a few frames
    # (restitution 0.5 bounces decay, so the TAIL settles at the radius —
    # look right after first touch, not after the argmin)
    i_hit = int(np.argmax(ys < 0.105))
    assert ys[i_hit] < 0.105                   # it did reach the plane
    assert ys[i_hit:i_hit + 8].max() > 0.112   # and bounced back up


def test_coupled_vmaps():
    """The coupled substep vmaps over batched scenes (RL with per-scene
    dynamic props)."""
    from softbodyunity_tpu.solver.rigid import step_coupled_scan

    host, cfg = _trampoline(n=6)
    top, state = api.init(host)
    rigid = make_rigid_state(top, [0.5])
    B = 3
    states = jax.tree.map(lambda a: jnp.stack([a] * B), state)
    rigids = jax.tree.map(lambda a: jnp.stack([a] * B), rigid)
    fn = jax.jit(jax.vmap(
        lambda s, r: step_coupled_scan(top, cfg, s, r, cfg.dt, 8),
        in_axes=(0, 0),
    ))
    ms, mr = fn(states, rigids)
    s1, r1 = api.step_coupled(top, cfg, state, n_substeps=8, rigid=rigid)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(ms.x[b]), np.asarray(s1.x),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(mr.centers[b]),
                                   np.asarray(r1.centers), atol=1e-6)


def test_friction_rolls_the_ball():
    """A ball sliding +x on the ground plane with friction picks up spin
    and converges to rolling without slipping (contact-point velocity
    u = v + omega x a -> 0 while it keeps translating)."""
    cfg = SimConfig(
        collision=CollisionParams(enable_plane=True, enable_spheres=True,
                                  restitution=0.0, friction=0.3),
        global_damping=0.0,
    )
    host = cloth_grid(
        4, 4, spacing=0.05, pinned=("corners",), springs=cfg.springs,
        xpbd=cfg.xpbd, plane_height=0.0, orientation="xy",
        origin=(9.0, 9.0, 9.0),                 # cloth far away
        sphere_centers=[[0.0, 0.1, 0.0]], sphere_radii=[0.1],
    )
    top, state = api.init(host)
    rigid = make_rigid_state(top, [1.0], velocities=[[2.0, 0.0, 0.0]])
    for _ in range(40):
        state, rigid = api.step_coupled(top, cfg, state, rigid)
    v = np.asarray(rigid.velocities)[0]
    om = np.asarray(rigid.omega)[0]
    # spin developed about -z (rolling forward in +x)
    assert om[2] < -1.0
    # still translating...
    assert v[0] > 0.5
    # ...and the contact point has (nearly) stopped slipping: u = v + w x a
    u = v + np.cross(om, [0.0, -0.1, 0.0])
    assert abs(u[0]) < 0.05 * 2.0
    # rolling-without-slipping ratio: v ~ omega * r
    assert abs(v[0] - (-om[2]) * 0.1) < 0.1 * v[0]


def test_spinning_ball_drags_cloth():
    """Backspin vs topspin: a spinning ball resting on a free cloth drags
    it sideways through the spin's surface velocity (the w_i term)."""
    cfg = SimConfig(
        collision=CollisionParams(enable_plane=False, enable_spheres=True,
                                  friction=0.5),
        global_damping=0.5,
    )
    n = 8
    host = cloth_grid(
        n, n, spacing=0.1, mass=0.05, pinned=(), springs=cfg.springs,
        xpbd=cfg.xpbd, plane_height=-99.0, orientation="xz",
        sphere_centers=[[0.35, -0.08, 0.35]], sphere_radii=[0.15],
    )
    top, state = api.init(host)
    # kinematic spinning ball (inv_mass 0): pure driver, like a roller
    rigid = make_rigid_state(top, [np.inf], omega=[[0.0, 0.0, -8.0]])
    for _ in range(30):
        state, rigid = api.step_coupled(top, cfg, state, rigid)
    vx = float(np.asarray(state.v)[:, 0].mean())
    # omega_z < 0 with contact arm +y above the ball: surface velocity
    # omega x arm = (-8 z) x (0.15 y-ish) -> +x: cloth dragged toward +x
    assert np.isfinite(np.asarray(state.x)).all()
    assert vx > 0.05


@pytest.mark.parametrize("solver", [Solver.VERLET, Solver.XPBD])
def test_ball_caught_by_all_solvers(solver):
    """Verlet/XPBD coupled: the projection-impulse reaction also catches
    the dropped ball on the trampoline (no fall-through)."""
    host, cfg = _trampoline(n=12)
    cfg = cfg.replace(solver=solver)
    top, state = api.init(host)
    rigid = make_rigid_state(top, [0.3])
    for _ in range(120):
        state, rigid = api.step_coupled(top, cfg, state, rigid)
    c = np.asarray(rigid.centers)[0]
    assert np.isfinite(np.asarray(state.x)).all()
    assert np.isfinite(c).all()
    assert c[1] > -0.8, f"{solver}: ball fell through (y={c[1]:.2f})"


def test_coupled_rejects_tearing_on_xpbd():
    from softbodyunity_tpu.core.config import TearParams

    host, cfg = _trampoline()
    cfg = cfg.replace(solver=Solver.XPBD,
                      tear=TearParams(enabled=True))
    top, state = api.init(host)
    rigid = make_rigid_state(top, [0.5])
    with pytest.raises(NotImplementedError, match="tearing"):
        api.step_coupled(top, cfg, state, rigid)


def test_coupled_sharded_matches_single():
    """Batch-sharded coupled scenes on the 8-device mesh == the
    single-scene coupled step (dp with per-scene rigid props)."""
    from softbodyunity_tpu.parallel.batch import batch_state
    from softbodyunity_tpu.parallel.sharding import (
        make_mesh,
        replicate_topology,
        shard_batched_state,
        step_coupled_sharded,
    )

    host, cfg = _trampoline(n=6)
    top, state = api.init(host)
    rigid = make_rigid_state(top, [0.5])
    mesh = make_mesh()
    tops = replicate_topology(top, mesh)
    states = shard_batched_state(batch_state(state, 8), mesh)
    rigids = shard_batched_state(
        jax.tree.map(lambda a: jnp.stack([a] * 8), rigid), mesh)
    s1, r1 = api.step_coupled(top, cfg, state, rigid)
    ms, mr = step_coupled_sharded(tops, cfg, states, rigids, mesh)
    for b in range(8):
        np.testing.assert_allclose(np.asarray(ms.x[b]), np.asarray(s1.x),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(mr.centers[b]),
                                   np.asarray(r1.centers), atol=1e-6)
        np.testing.assert_allclose(np.asarray(mr.omega[b]),
                                   np.asarray(r1.omega), atol=1e-5)


def test_coupled_sharded_threads_tear_plastic():
    """Tear liveness / plastic rest-scale planes shard through the
    coupled batch entry (round-3 VERDICT hole: step_coupled_sharded
    raised NotImplementedError): 8-device equality vs the single-scene
    coupled Euler step, feature planes included."""
    from softbodyunity_tpu.core.config import PlasticityParams, TearParams
    from softbodyunity_tpu.parallel.batch import batch_state
    from softbodyunity_tpu.parallel.sharding import (
        make_mesh,
        replicate_topology,
        shard_batched_state,
        step_coupled_sharded,
    )

    host, cfg = _trampoline(n=6)
    # strain past the tear limit under the ball, plastic flow before it
    cfg = cfg.replace(tear=TearParams(enabled=True, strain_limit=0.03),
                      plasticity=PlasticityParams(enabled=True,
                                                  yield_strain=0.02,
                                                  creep=0.02))
    top, state = api.init(host)
    state = api.ensure_tear_state(top, cfg, state)
    state = api.ensure_plastic_state(top, cfg, state)
    rigid = make_rigid_state(top, [8.0])   # heavy ball: strains past tear
    mesh = make_mesh()
    tops = replicate_topology(top, mesh)
    states = shard_batched_state(batch_state(state, 8), mesh)
    rigids = shard_batched_state(
        jax.tree.map(lambda a: jnp.stack([a] * 8), rigid), mesh)
    s1, r1 = state, rigid
    for _ in range(14):   # enough frames that flow + tear both engage
        s1, r1 = api.step_coupled(top, cfg, s1, r1)
        states, rigids = step_coupled_sharded(tops, cfg, states, rigids,
                                              mesh)
    assert float(jnp.sum(s1.edge_alive)) < s1.edge_alive.shape[0], \
        "scene never tore — test scene needs retuning"
    assert float(jnp.max(s1.rest_scale)) > 1.0, "no plastic flow"
    for b in range(8):
        np.testing.assert_allclose(np.asarray(states.x[b]),
                                   np.asarray(s1.x), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(states.edge_alive[b]),
                                      np.asarray(s1.edge_alive))
        np.testing.assert_allclose(np.asarray(states.rest_scale[b]),
                                   np.asarray(s1.rest_scale), atol=1e-6)
        np.testing.assert_allclose(np.asarray(rigids.centers[b]),
                                   np.asarray(r1.centers), atol=1e-6)


def test_hand_built_rigidstate_without_omega():
    """RigidState's omega default (None) must not break the scan carry —
    step_coupled normalizes it to zeros."""
    from softbodyunity_tpu.solver.rigid import RigidState

    host, cfg = _trampoline(n=6)
    top, state = api.init(host)
    r = RigidState(
        centers=top.sphere_centers,
        velocities=jnp.zeros_like(top.sphere_centers),
        inv_mass=jnp.asarray([2.0], jnp.float32),
    )
    s2, r2 = api.step_coupled(top, cfg, state, r)
    assert np.isfinite(np.asarray(s2.x)).all()
    assert r2.omega is not None


def test_coupled_requires_enable_spheres():
    host, cfg = _trampoline(n=6)
    cfg = cfg.replace(collision=CollisionParams(enable_plane=True,
                                                enable_spheres=False))
    top, state = api.init(host)
    rigid = make_rigid_state(top, [0.5])
    with pytest.raises(ValueError, match="enable_spheres"):
        api.step_coupled(top, cfg, state, rigid)


@pytest.mark.slow
def test_coupled_1k_frames_stable():
    """Long-horizon f32 statement for the coupled path: 1000 frames of
    ball-on-trampoline stay finite, the ball stays caught, and the
    settled contact supports it (no slow energy pump from the
    measure-then-react loop)."""
    host, cfg = _trampoline(n=12)
    top, state = api.init(host)
    rigid = make_rigid_state(top, [0.4])
    for _ in range(1000):
        state, rigid = api.step_coupled(top, cfg, state, rigid)
    x = np.asarray(state.x)
    c = np.asarray(rigid.centers)[0]
    vb = np.asarray(rigid.velocities)[0]
    assert np.isfinite(x).all() and np.isfinite(c).all()
    assert c[1] > -0.8                      # still caught
    assert np.linalg.norm(vb) < 0.05        # fully settled, not pumping
    assert np.abs(np.asarray(rigid.omega)).max() < 1.0


def _free_balls_scene(*, centers, radii, e=1.0, mu=0.0, boxes=None,
                      capsules=None, solver=Solver.SEMI_IMPLICIT_EULER):
    """A tiny pinned cloth far below the action: the balls' environment
    (ball-ball, ball-static) is exercised without cloth contact."""
    cfg = SimConfig(
        solver=solver,
        gravity=(0.0, 0.0, 0.0),
        collision=CollisionParams(
            enable_plane=True, enable_spheres=True,
            enable_boxes=boxes is not None,
            enable_capsules=capsules is not None,
            restitution=e, friction=mu,
        ),
        global_damping=0.0,
    )
    host = cloth_grid(
        4, 4, spacing=0.05, pinned=("top", "bottom"),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-50.0,
        orientation="xz", origin=(-0.075, -40.0, -0.075),
        sphere_centers=centers, sphere_radii=radii,
    )
    if boxes is not None or capsules is not None:
        from softbodyunity_tpu.core.topology import add_colliders

        kw = {}
        if boxes is not None:
            kw.update(box_centers=boxes[0], box_half_extents=boxes[1],
                      box_rotations=boxes[2])
        if capsules is not None:
            kw.update(capsule_p0=capsules[0], capsule_p1=capsules[1],
                      capsule_radii=capsules[2])
        host = add_colliders(host, **kw)
    return host, cfg


def test_ball_ball_elastic_head_on():
    """Equal masses, e=1, mu=0, head-on: the balls exchange velocities
    (momentum and energy conserved) and end separated."""
    host, cfg = _free_balls_scene(
        centers=[[-0.3, 0.0, 0.0], [0.3, 0.0, 0.0]], radii=[0.1, 0.1])
    top, state = api.init(host)
    r = make_rigid_state(top, [0.5, 0.5],
                         velocities=[[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    step = jax.jit(lambda s, r: sb.step_coupled(top, cfg, s, r))
    for _ in range(30):
        state, r = step(state, r)
    rv = np.asarray(r.velocities)
    rc = np.asarray(r.centers)
    np.testing.assert_allclose(rv[0], [-1.0, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(rv[1], [1.0, 0.0, 0.0], atol=1e-5)
    assert np.linalg.norm(rc[0] - rc[1]) >= 0.2 - 1e-5


def test_ball_ball_momentum_conserved_unequal():
    """Unequal masses, e=0.6: total momentum is exactly conserved through
    the contact and the balls do not interpenetrate."""
    host, cfg = _free_balls_scene(
        centers=[[-0.25, 0.0, 0.0], [0.25, 0.01, 0.0]], radii=[0.1, 0.08],
        e=0.6, mu=0.2)
    top, state = api.init(host)
    masses = np.array([0.3, 0.9])
    r = make_rigid_state(top, masses,
                         velocities=[[1.5, 0.0, 0.0], [-0.5, 0.0, 0.0]])
    p0 = (masses[:, None] * np.asarray(r.velocities)).sum(axis=0)
    step = jax.jit(lambda s, r: sb.step_coupled(top, cfg, s, r))
    for _ in range(40):
        state, r = step(state, r)
    rv = np.asarray(r.velocities)
    rc = np.asarray(r.centers)
    p1 = (masses[:, None] * rv).sum(axis=0)
    np.testing.assert_allclose(p1, p0, atol=1e-5)
    assert np.linalg.norm(rc[0] - rc[1]) >= 0.18 - 1e-4
    # the collision actually happened (velocities changed sign order)
    assert rv[0][0] < rv[1][0]


def test_ball_bounces_off_static_box():
    """A ball rolling toward a static box wall bounces back with e=0.8."""
    host, cfg = _free_balls_scene(
        centers=[[-0.5, 0.0, 0.0]], radii=[0.1], e=0.8,
        boxes=([[0.5, 0.0, 0.0]], [[0.2, 0.4, 0.4]], [np.eye(3)]))
    top, state = api.init(host)
    r = make_rigid_state(top, [0.5], velocities=[[2.0, 0.0, 0.0]])
    step = jax.jit(lambda s, r: sb.step_coupled(top, cfg, s, r))
    for _ in range(30):
        state, r = step(state, r)
    rv = np.asarray(r.velocities)
    rc = np.asarray(r.centers)
    assert rv[0, 0] < -1.4           # bounced back at ~e * v
    assert rc[0, 0] < 0.2 - 0.1 + 1e-4   # outside the box face
    assert np.isfinite(np.asarray(state.x)).all()


def test_ball_bounces_off_static_capsule():
    """A ball fired at a static capsule's core reflects off it."""
    host, cfg = _free_balls_scene(
        centers=[[-0.5, 0.0, 0.0]], radii=[0.1], e=0.9,
        capsules=([[0.3, 0.0, -0.5]], [[0.3, 0.0, 0.5]], [0.15]))
    top, state = api.init(host)
    r = make_rigid_state(top, [0.5], velocities=[[2.0, 0.0, 0.0]])
    step = jax.jit(lambda s, r: sb.step_coupled(top, cfg, s, r))
    for _ in range(30):
        state, r = step(state, r)
    rv = np.asarray(r.velocities)
    rc = np.asarray(r.centers)
    assert rv[0, 0] < -1.5
    assert rc[0, 0] <= 0.3 - 0.25 + 1e-4  # outside the capsule surface
    assert np.isfinite(np.asarray(state.x)).all()


def test_kinematic_ball_pair_inert():
    """Two overlapping kinematic balls (inv_mass 0) are inert scenery:
    the contact pass changes nothing and produces no NaNs."""
    host, cfg = _free_balls_scene(
        centers=[[0.0, 0.0, 0.0], [0.05, 0.0, 0.0]], radii=[0.1, 0.1])
    top, state = api.init(host)
    r = make_rigid_state(top, [np.inf, np.inf])
    step = jax.jit(lambda s, r: sb.step_coupled(top, cfg, s, r))
    for _ in range(5):
        state, r = step(state, r)
    np.testing.assert_array_equal(np.asarray(r.velocities), 0.0)
    np.testing.assert_allclose(np.asarray(r.centers),
                               [[0.0, 0.0, 0.0], [0.05, 0.0, 0.0]],
                               atol=1e-7)
    assert np.isfinite(np.asarray(state.x)).all()


@pytest.mark.parametrize("solver", [Solver.SEMI_IMPLICIT_EULER,
                                    Solver.VERLET, Solver.XPBD])
def test_two_ball_environment_f64_parity(solver):
    """f64 exact tier for the rigid environment (ball-ball + static box +
    plane) through a cloth-coupled scene on every solver."""
    from softbodyunity_tpu.core.topology import add_colliders
    from softbodyunity_tpu.solver.rigid import step_coupled_scan

    jax.config.update("jax_enable_x64", True)
    cfg = SimConfig(
        solver=solver,
        springs=sb.SpringParams(k_structural=600.0, damping=0.5),
        collision=CollisionParams(enable_plane=True, enable_spheres=True,
                                  enable_boxes=True, restitution=0.4,
                                  friction=0.3),
        global_damping=0.2,
    )
    host = cloth_grid(
        10, 10, spacing=0.06, shear=True, bend=True,
        pinned=("tl", "tr", "bl", "br"),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-1.0,
        orientation="xz", origin=(-0.27, 0.0, -0.27),
        sphere_centers=[[-0.3, 0.35, 0.0], [0.3, 0.38, 0.0]],
        sphere_radii=[0.12, 0.12],
    )
    host = add_colliders(
        host, box_centers=[[0.0, -0.6, 0.6]],
        box_half_extents=[[0.5, 0.3, 0.2]], box_rotations=[np.eye(3)])
    top, state = api.init(host, dtype=jnp.float64)
    r0 = make_rigid_state(
        top, [0.4, 0.4],
        velocities=[[1.2, 0.0, 0.05], [-1.2, 0.0, -0.05]],
        omega=[[0.0, 0.0, 5.0], [0.0, 0.0, 0.0]])
    x = host.positions0.copy()
    v = np.zeros_like(x)
    xp = x.copy()
    rc = np.asarray(r0.centers, np.float64)
    rv = np.asarray(r0.velocities, np.float64)
    rom = np.asarray(r0.omega, np.float64)
    rim = np.asarray(r0.inv_mass, np.float64)
    dt = cfg.dt / cfg.n_substeps
    sub = {
        Solver.SEMI_IMPLICIT_EULER:
            lambda *a, **k: oracle.substep_euler_coupled(*a, **k)[:6],
        Solver.VERLET: oracle.substep_verlet_coupled,
        Solver.XPBD: oracle.substep_xpbd_coupled,
    }[solver]
    for _ in range(40):
        for _ in range(cfg.n_substeps):
            x, v, xp, rc, rv, rom = sub(host, cfg, x, v, xp, rc, rv, rim,
                                        dt, romega=rom)
    s, r = state, r0
    fn = jax.jit(
        lambda s, r: step_coupled_scan(top, cfg, s, r, dt, cfg.n_substeps))
    for _ in range(40):
        s, r = fn(s, r)
    assert np.max(np.abs(np.asarray(s.x) - x)) < 1e-6
    assert np.max(np.abs(np.asarray(r.centers) - rc)) < 1e-8
    assert np.max(np.abs(np.asarray(r.velocities) - rv)) < 1e-8
    assert np.max(np.abs(np.asarray(r.omega) - rom)) < 1e-8
    # the balls actually met (started 0.6 apart, radii sum 0.24)
    assert np.linalg.norm(rc[0] - rc[1]) > 0.24


def test_heavy_cloth_stack_stays_bounded():
    """Stability at ANY cloth/ball mass ratio: three 0.4 kg balls dropped
    in a column onto a default-mass cloth (1 kg/vertex — contact patch
    ~15x the ball mass).  The old full-forcing exchange (beta = 1) had
    contact loop gain (1+e)*m_c/M ~ 50 and catapulted a ball to 790 m/s
    within 35 frames; the reduced-mass split keeps every velocity at the
    free-fall scale.  (Euler — the velocity-level exchange was the
    explosive one.)"""
    cfg = SimConfig(
        solver=Solver.SEMI_IMPLICIT_EULER,
        collision=CollisionParams(enable_plane=True, enable_spheres=True,
                                  restitution=0.3, friction=0.3),
    )
    host = cloth_grid(
        16, 16, spacing=0.075, pinned=("top", "bottom", "left", "right"),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-2.0,
        orientation="xz", origin=(-0.6, 0.0, -0.6),
        sphere_centers=[[0.0, 0.5, 0.0], [0.02, 0.9, 0.0],
                        [-0.02, 1.3, 0.01]],
        sphere_radii=[0.12, 0.12, 0.12])
    top, state = api.init(host)
    r = make_rigid_state(top, [0.4, 0.4, 0.4])
    step = jax.jit(lambda s, r: sb.step_coupled(top, cfg, s, r))
    vmax = 0.0
    for _ in range(120):
        state, r = step(state, r)
        vmax = max(vmax, float(np.abs(np.asarray(r.velocities)).max()))
    assert np.isfinite(np.asarray(state.x)).all()
    assert np.isfinite(np.asarray(r.centers)).all()
    # free-fall over the full drop is ~6.5 m/s; 790 m/s was the explosion
    assert vmax < 12.0, vmax
