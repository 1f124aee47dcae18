"""Fused Pallas lattice (tet-cube) kernel vs its banded jnp twin
(SURVEY.md §4: every Pallas kernel has a jnp twin; interpret=True makes
these runnable on CPU)."""

import dataclasses

import numpy as np
import pytest

import jax

from softbodyunity_tpu import api
from softbodyunity_tpu.core.config import CollisionParams, SimConfig, SpringParams
from softbodyunity_tpu.core.topology import tet_cube
from softbodyunity_tpu.kernels.pallas_lattice import (
    lattice_applicable,
    make_lattice_step,
)
from softbodyunity_tpu.solver.step import step_scan


def _scene(n=6, volume_stiffness=0.5, plane_height=0.0, origin_y=0.01):
    cfg = SimConfig(
        springs=SpringParams(k_structural=1200.0, damping=1.5),
        collision=CollisionParams(enable_plane=True, friction=0.4),
        global_damping=0.5,
        volume_stiffness=volume_stiffness,
    )
    host = tet_cube(
        n, spacing=0.08, springs=cfg.springs, xpbd=cfg.xpbd,
        plane_height=plane_height, origin=(0.0, origin_y, 0.0),
    )
    return host, cfg


def _run_both(host, cfg, n_sub=48):
    top, state = api.init(host)
    assert lattice_applicable(top, cfg)
    pal = make_lattice_step(top, cfg, interpret=True)
    ref = jax.jit(lambda t, s: step_scan(t, cfg, s, cfg.dt, n_sub))
    return pal(state, cfg.dt, n_sub), ref(top, state)


# n=6 -> N=216 = 1*128 + 88 (pad exercise); n=7 -> N=343
@pytest.mark.parametrize("n", [6, 7])
def test_lattice_matches_banded_jnp(n):
    host, cfg = _scene(n=n)
    s_pal, s_ref = _run_both(host, cfg)
    np.testing.assert_allclose(np.asarray(s_pal.x), np.asarray(s_ref.x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_pal.v), np.asarray(s_ref.v), atol=2e-3)
    # the cube actually reaches the ground plane in this scene
    assert np.asarray(s_ref.x)[:, 1].min() <= 0.0 + 1e-6


def test_lattice_no_volume_constraint():
    host, cfg = _scene(volume_stiffness=0.0)
    s_pal, s_ref = _run_both(host, cfg)
    np.testing.assert_allclose(np.asarray(s_pal.x), np.asarray(s_ref.x), atol=2e-5)


def test_lattice_pinned_vertices_hold():
    host, cfg = _scene()
    host.inv_mass[:8] = 0.0  # pin a corner block of the lattice
    top, state = api.init(host)
    assert lattice_applicable(top, cfg)
    pal = make_lattice_step(top, cfg, interpret=True)
    s = pal(state, cfg.dt, 64)
    np.testing.assert_array_equal(
        np.asarray(s.x)[:8], np.asarray(state.x)[:8]
    )
    ref = jax.jit(lambda t, st: step_scan(t, cfg, st, cfg.dt, 64))(top, state)
    np.testing.assert_allclose(np.asarray(s.x), np.asarray(ref.x), atol=2e-5)


def test_lattice_sphere_collider_matches():
    host, cfg = _scene(plane_height=-5.0, origin_y=0.25)
    host.sphere_centers = np.array([[0.2, -0.02, 0.2]])
    host.sphere_radii = np.array([0.3])
    cfg = cfg.replace(
        collision=dataclasses.replace(cfg.collision, enable_spheres=True)
    )
    s_pal, s_ref = _run_both(host, cfg, n_sub=96)
    np.testing.assert_allclose(np.asarray(s_pal.x), np.asarray(s_ref.x), atol=5e-5)
    # the cube actually rests on the sphere
    d = np.linalg.norm(np.asarray(s_ref.x) - np.array([0.2, -0.02, 0.2]), axis=1)
    assert d.min() < 0.35


def test_lattice_gates():
    from softbodyunity_tpu.core.config import Solver

    host, cfg = _scene()
    top, _ = api.init(host)
    assert lattice_applicable(top, cfg)
    assert not lattice_applicable(top, cfg.replace(solver=Solver.XPBD))
    # f64 topologies (oracle-parity tier) must not take the f32 kernel
    jax.config.update("jax_enable_x64", True)
    try:
        top64, _ = api.init(host, dtype=jax.numpy.float64)
        assert not lattice_applicable(top64, cfg)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_dispatch_routes_lattice():
    from softbodyunity_tpu.kernels import dispatch

    host, cfg = _scene()
    top, _ = api.init(host)
    fast = dispatch.maybe_fast_step(top, cfg, "pallas")
    assert fast is not None
    # jnp / stencil backends fall back to the banded path (no Mosaic on CPU)
    assert dispatch.maybe_fast_step(top, cfg, "stencil") is None


def test_lattice_verlet_matches_banded_jnp():
    from softbodyunity_tpu.core.config import Solver
    from softbodyunity_tpu.kernels.pallas_lattice import (
        lattice_verlet_applicable,
        make_lattice_verlet_step,
    )

    host, cfg = _scene(n=6)
    cfg = cfg.replace(solver=Solver.VERLET)
    top, state = api.init(host)
    assert lattice_verlet_applicable(top, cfg)
    pal = make_lattice_verlet_step(top, cfg, interpret=True)
    ref = jax.jit(lambda t, s: step_scan(t, cfg, s, cfg.dt, 48))
    s_ref = ref(top, state)
    s_pal = pal(state, cfg.dt, 48)
    np.testing.assert_allclose(np.asarray(s_pal.x), np.asarray(s_ref.x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_pal.x_prev),
                               np.asarray(s_ref.x_prev), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_pal.v), np.asarray(s_ref.v), atol=2e-3)
    # the cube actually reaches the ground plane in this scene
    assert np.asarray(s_ref.x)[:, 1].min() <= 0.0 + 1e-6


def test_lattice_verlet_sphere_pinned_matches():
    """Verlet lattice + sphere contact + pinned vertices: interpret-mode
    twin equality against the banded jnp path."""
    from softbodyunity_tpu.core.config import Solver
    from softbodyunity_tpu.kernels.pallas_lattice import (
        lattice_verlet_applicable,
        make_lattice_verlet_step,
    )

    host, cfg = _scene(n=6, plane_height=-5.0, origin_y=0.25)
    host.sphere_centers = np.array([[0.2, -0.02, 0.2]])
    host.sphere_radii = np.array([0.3])
    host.inv_mass[:4] = 0.0
    cfg = cfg.replace(
        solver=Solver.VERLET,
        collision=dataclasses.replace(cfg.collision, enable_spheres=True),
    )
    top, state = api.init(host)
    assert lattice_verlet_applicable(top, cfg)
    pal = make_lattice_verlet_step(top, cfg, interpret=True)
    ref = jax.jit(lambda t, s: step_scan(t, cfg, s, cfg.dt, 96))
    s_ref = ref(top, state)
    s_pal = pal(state, cfg.dt, 96)
    np.testing.assert_allclose(np.asarray(s_pal.x), np.asarray(s_ref.x),
                               atol=5e-5)
    np.testing.assert_array_equal(
        np.asarray(s_pal.x)[:4], np.asarray(state.x)[:4]
    )
    # the cube actually rests on the sphere
    d = np.linalg.norm(
        np.asarray(s_ref.x) - np.array([0.2, -0.02, 0.2]), axis=1
    )
    assert d.min() < 0.35


def test_lattice_verlet_dispatch_routes():
    from softbodyunity_tpu.core.config import Solver
    from softbodyunity_tpu.kernels import dispatch

    host, cfg = _scene(n=6)
    cfg = cfg.replace(solver=Solver.VERLET)
    top, state = api.init(host)
    fn = dispatch.maybe_fast_step(top, cfg, "pallas")
    assert fn is not None
    jaxpr = str(jax.make_jaxpr(lambda t, s: fn(s, cfg.dt, 2))(top, state))
    assert "pallas_call" in jaxpr


def test_lattice_xpbd_matches_banded_jnp():
    from softbodyunity_tpu.core.config import Solver, XPBDParams
    from softbodyunity_tpu.kernels.pallas_lattice import (
        lattice_xpbd_applicable,
        make_lattice_xpbd_step,
    )

    host, cfg = _scene(n=6)
    cfg = cfg.replace(
        solver=Solver.XPBD,
        xpbd=XPBDParams(compliance_distance=1e-6, compliance_volume=1e-7,
                        n_iterations=4, relaxation=1.0),
    )
    top, state = api.init(host)
    assert lattice_xpbd_applicable(top, cfg)
    pal = make_lattice_xpbd_step(top, cfg, interpret=True)
    ref = jax.jit(lambda t, s: step_scan(t, cfg, s, cfg.dt, 64))
    s_ref = ref(top, state)
    s_pal = pal(state, cfg.dt, 64)
    np.testing.assert_allclose(np.asarray(s_pal.x), np.asarray(s_ref.x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_pal.v), np.asarray(s_ref.v), atol=2e-3)
    # the cube reaches the plane (contact exercised inside the Jacobi loop)
    assert np.asarray(s_ref.x)[:, 1].min() <= 1e-6


def test_lattice_xpbd_dispatch_routes():
    from softbodyunity_tpu.core.config import Solver, XPBDParams
    from softbodyunity_tpu.kernels import dispatch

    host, cfg = _scene(n=6)
    cfg = cfg.replace(
        solver=Solver.XPBD,
        xpbd=XPBDParams(compliance_distance=1e-6, n_iterations=4),
    )
    top, state = api.init(host)
    fn = dispatch.maybe_fast_step(top, cfg, "pallas")
    assert fn is not None
    jaxpr = str(jax.make_jaxpr(lambda t, s: fn(s, cfg.dt, 2))(top, state))
    assert "pallas_call" in jaxpr


def test_lattice_xpbd_sphere_collider_matches():
    """XPBD lattice + sphere collider (the combination that exposed a
    missing kernel import): interpret-mode twin equality with real
    sphere contact."""
    from softbodyunity_tpu.core.config import Solver, XPBDParams
    from softbodyunity_tpu.kernels.pallas_lattice import (
        lattice_xpbd_applicable,
        make_lattice_xpbd_step,
    )

    host, cfg = _scene(n=6, plane_height=-5.0, origin_y=0.3)
    host.sphere_centers = np.array([[0.2, -0.02, 0.2]])
    host.sphere_radii = np.array([0.3])
    cfg = cfg.replace(
        solver=Solver.XPBD,
        xpbd=XPBDParams(compliance_distance=1e-6, compliance_volume=1e-7,
                        n_iterations=4, relaxation=1.0),
        collision=dataclasses.replace(cfg.collision, enable_spheres=True),
    )
    top, state = api.init(host)
    assert lattice_xpbd_applicable(top, cfg)
    pal = make_lattice_xpbd_step(top, cfg, interpret=True)
    ref = jax.jit(lambda t, s: step_scan(t, cfg, s, cfg.dt, 64))
    s_ref = ref(top, state)
    s_pal = pal(state, cfg.dt, 64)
    np.testing.assert_allclose(np.asarray(s_pal.x), np.asarray(s_ref.x),
                               atol=2e-5)
    # the cube actually rests on the sphere
    d = np.linalg.norm(
        np.asarray(s_ref.x) - np.array([0.2, -0.02, 0.2]), axis=1
    )
    assert d.min() < 0.31


def _jelly_lattice_scene(solver):
    """Banded tet lattice with spatial shape-matching clusters — the
    hybrid-path workload (jelly_voxel_50k shrunk to test size)."""
    from softbodyunity_tpu.core.config import ShapeMatchParams, Solver
    from softbodyunity_tpu.core.topology import enable_shape_matching

    cfg = SimConfig(
        solver=solver,
        shape_match=ShapeMatchParams(enabled=True, stiffness=0.25),
        springs=SpringParams(k_structural=300.0, damping=0.8),
        collision=CollisionParams(enable_plane=True, friction=0.4),
        global_damping=0.4,
        volume_stiffness=0.3,
    )
    host = tet_cube(
        6, spacing=0.08, springs=cfg.springs, xpbd=cfg.xpbd,
        plane_height=0.0, origin=(0.0, -0.01, 0.0),
    )
    return enable_shape_matching(host, cell_size=0.18), cfg


@pytest.mark.parametrize("solver_name", ["euler", "verlet"])
def test_lattice_shapematch_hybrid_matches_jnp(solver_name):
    """The hybrid step (fused kernel integrate+volume, MXU shape matching
    + contact outside) == the general jnp path to kernel rounding."""
    from softbodyunity_tpu.core.config import Solver
    from softbodyunity_tpu.kernels.pallas_lattice import (
        lattice_shapematch_applicable,
        make_lattice_shapematch_step,
    )

    solver = (Solver.VERLET if solver_name == "verlet"
              else Solver.SEMI_IMPLICIT_EULER)
    host, cfg = _jelly_lattice_scene(solver)
    top, state = api.init(host)
    state = api.ensure_shapematch_state(top, cfg, state)
    assert lattice_shapematch_applicable(top, cfg)
    hyb = make_lattice_shapematch_step(top, cfg, interpret=True)
    s_h = hyb(state, cfg.dt, 48)
    s_ref = jax.jit(lambda t, s: step_scan(t, cfg, s, cfg.dt, 48))(top, state)
    np.testing.assert_allclose(np.asarray(s_h.x), np.asarray(s_ref.x),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(s_h.cluster_quat),
                               np.asarray(s_ref.cluster_quat), atol=3e-5)
    # contact was exercised (the scene STARTS penetrating the plane and
    # ends pushed out) and the clusters actually rotated
    assert host.positions0[:, 1].min() < 0.0
    assert np.asarray(s_ref.x)[:, 1].min() >= -1e-6
    assert float(np.abs(np.asarray(s_ref.cluster_quat)[:, 1:]).max()) > 1e-4


def test_lattice_shapematch_dispatch_routes_to_hybrid():
    """A shape-matched banded lattice lowers through the hybrid path on
    the pallas backend; dormant quats fall back to the plain kernel."""
    from softbodyunity_tpu.core.config import Solver
    from softbodyunity_tpu.kernels import dispatch

    host, cfg = _jelly_lattice_scene(Solver.SEMI_IMPLICIT_EULER)
    top, _ = api.init(host)
    assert dispatch.maybe_fast_step(top, cfg, "pallas") is not None
    # XPBD has no hybrid (λ state lives inside the Jacobi loop)
    assert dispatch.maybe_fast_step(
        top, cfg.replace(solver=Solver.XPBD), "pallas") is None
