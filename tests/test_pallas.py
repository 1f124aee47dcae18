"""Fused Pallas substep kernel vs its jnp twin (SURVEY.md §4: every Pallas
kernel has a jnp twin; interpret=True makes these runnable on CPU)."""

import numpy as np
import pytest

import jax

from softbodyunity_tpu import api
from softbodyunity_tpu.core.config import CollisionParams, SimConfig, SpringParams
from softbodyunity_tpu.core.topology import cloth_grid
from softbodyunity_tpu.kernels.pallas_substep import make_pallas_step
from softbodyunity_tpu.kernels.stencil import make_stencil_step


def _scene(shear=True, bend=True, pinned=("tl", "tr")):
    cfg = SimConfig(
        springs=SpringParams(k_structural=500.0, k_shear=250.0, k_bend=100.0, damping=0.6),
        collision=CollisionParams(enable_plane=True, friction=0.2),
        global_damping=0.3,
    )
    host = cloth_grid(
        16, 8, spacing=0.05, shear=shear, bend=bend, pinned=pinned,
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-0.25, orientation="xy",
    )
    return host, cfg


# structural-only cloth pinned at two corners is floppier => contact chaos
# amplifies rsqrt-vs-sqrt rounding faster; tolerances reflect that
@pytest.mark.parametrize(
    "shear,bend,atol_x,atol_v",
    [(False, False, 5e-4, 5e-2), (True, True, 5e-6, 5e-4)],
)
def test_pallas_matches_stencil_interpret(shear, bend, atol_x, atol_v):
    host, cfg = _scene(shear=shear, bend=bend)
    top, state = api.init(host)
    pal = make_pallas_step(top, cfg, interpret=True)
    ref = jax.jit(lambda t, s: make_stencil_step(t, cfg)(s, cfg.dt, 64))
    s_ref = ref(top, state)
    s_pal = pal(state, cfg.dt, 64)
    np.testing.assert_allclose(np.asarray(s_pal.x), np.asarray(s_ref.x), atol=atol_x)
    np.testing.assert_allclose(np.asarray(s_pal.v), np.asarray(s_ref.v), atol=atol_v)


def test_pallas_sphere_collider_matches_stencil():
    import dataclasses

    host, cfg = _scene()
    host.sphere_centers = np.array([[0.35, -0.4, 0.0]])
    host.sphere_radii = np.array([0.15])
    cfg = cfg.replace(
        collision=dataclasses.replace(cfg.collision, enable_spheres=True)
    )
    top, state = api.init(host)
    pal = make_pallas_step(top, cfg, interpret=True)
    ref = jax.jit(lambda t, s: make_stencil_step(t, cfg)(s, cfg.dt, 96))
    s_ref = ref(top, state)
    s_pal = pal(state, cfg.dt, 96)
    np.testing.assert_allclose(np.asarray(s_pal.x), np.asarray(s_ref.x), atol=2e-5)
    # cloth actually contacts the sphere in this scene
    d = np.linalg.norm(np.asarray(s_pal.x) - np.array([0.35, -0.4, 0.0]), axis=1)
    assert d.min() < 0.151


def test_pallas_gate_too_large():
    from softbodyunity_tpu.kernels.pallas_substep import MAX_VMEM_VERTICES
    host, cfg = _scene()
    top, _ = api.init(host)
    import dataclasses as dc
    big = dc.replace(top, grid_shape=(512, 512))
    with pytest.raises(ValueError):
        make_pallas_step(big, cfg)


def test_pallas_pinned_hold_interpret():
    host, cfg = _scene()
    top, state = api.init(host)
    pal = make_pallas_step(top, cfg, interpret=True)
    s = pal(state, cfg.dt, 128)
    x = np.asarray(s.x)
    assert np.isfinite(x).all()
    pinned = host.inv_mass == 0.0
    assert pinned.sum() == 2
    np.testing.assert_array_equal(x[pinned], host.positions0[pinned])


def test_pallas_xpbd_matches_stencil_interpret():
    import dataclasses
    from softbodyunity_tpu.core.config import Solver, XPBDParams
    from softbodyunity_tpu.kernels.pallas_xpbd import make_pallas_xpbd_step

    host, cfg = _scene()
    cfg = cfg.replace(
        solver=Solver.XPBD,
        xpbd=XPBDParams(compliance_distance=1e-6, compliance_bend=5e-4,
                        n_iterations=6, relaxation=1.0),
    )
    top, state = api.init(host)
    pal = make_pallas_xpbd_step(top, cfg, interpret=True)
    ref = jax.jit(lambda t, s: make_stencil_step(t, cfg)(s, cfg.dt, 64))
    s_ref = ref(top, state)
    s_pal = pal(state, cfg.dt, 64)
    np.testing.assert_allclose(np.asarray(s_pal.x), np.asarray(s_ref.x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_pal.v), np.asarray(s_ref.v), atol=1e-3)


def test_pallas_verlet_matches_stencil_interpret():
    from softbodyunity_tpu.core.config import Solver
    from softbodyunity_tpu.kernels.pallas_substep import make_pallas_verlet_step

    host, cfg = _scene()
    cfg = cfg.replace(solver=Solver.VERLET)
    top, state = api.init(host)
    pal = make_pallas_verlet_step(top, cfg, interpret=True)
    ref = jax.jit(lambda t, s: make_stencil_step(t, cfg)(s, cfg.dt, 64))
    s_ref = ref(top, state)
    s_pal = pal(state, cfg.dt, 64)
    # the scene drapes onto the plane with friction 0.2: the plane-friction
    # contact mask is discrete, so 1-ulp pre-clamp y noise between the two
    # compiled programs occasionally flips it and applies/skips a 20%
    # tangential damp — measured 1.2e-4 max over 64 substeps on ~4% of
    # vertices (contact chaos, same class as the golden contact bounds).
    # Exact semantic equality is pinned at f64 by
    # tests/test_plane_friction.py::test_sliding_oracle_parity_f64.
    np.testing.assert_allclose(np.asarray(s_pal.x), np.asarray(s_ref.x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(s_pal.v), np.asarray(s_ref.v), atol=5e-2)
    # pinned corners bit-frozen
    pinned = host.inv_mass == 0.0
    np.testing.assert_array_equal(np.asarray(s_pal.x)[pinned], host.positions0[pinned])


def test_pallas_verlet_sphere_matches_stencil():
    import dataclasses
    from softbodyunity_tpu.core.config import Solver
    from softbodyunity_tpu.kernels.pallas_substep import make_pallas_verlet_step

    host, cfg = _scene()
    # the shared scene starts with its bottom rows below the plane, which
    # explicit Verlet turns into a position-projection velocity kick and a
    # blowup (the no-sphere equivalence test tolerates that, a contact test
    # cannot); rebuild with the plane out of reach and mild axial damping
    cfg = cfg.replace(
        solver=Solver.VERLET,
        springs=SpringParams(k_structural=500.0, k_shear=250.0,
                             k_bend=100.0, damping=0.1),
        collision=dataclasses.replace(cfg.collision, enable_spheres=True),
    )
    host = cloth_grid(
        16, 8, spacing=0.05, shear=True, bend=True, pinned=("tl", "tr"),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-2.5,
        orientation="xy",
    )
    host.sphere_centers = np.array([[0.375, -0.45, 0.0]])
    host.sphere_radii = np.array([0.15])
    top, state = api.init(host)
    pal = make_pallas_verlet_step(top, cfg, interpret=True)
    ref = jax.jit(lambda t, s: make_stencil_step(t, cfg)(s, cfg.dt, 240))
    s_ref = ref(top, state)
    s_pal = pal(state, cfg.dt, 240)
    np.testing.assert_allclose(np.asarray(s_pal.x), np.asarray(s_ref.x), atol=2e-5)
    d = np.linalg.norm(np.asarray(s_pal.x) - np.array([0.375, -0.45, 0.0]), axis=1)
    assert d.min() < 0.151  # real contact occurred


def test_pallas_xpbd_sphere_matches_stencil():
    import dataclasses
    from softbodyunity_tpu.core.config import Solver, XPBDParams
    from softbodyunity_tpu.kernels.pallas_xpbd import make_pallas_xpbd_step

    host, cfg = _scene()
    host.sphere_centers = np.array([[0.375, -0.3, 0.0]])
    host.sphere_radii = np.array([0.15])
    cfg = cfg.replace(
        solver=Solver.XPBD,
        xpbd=XPBDParams(compliance_distance=1e-6, compliance_bend=5e-4,
                        n_iterations=6, relaxation=1.0),
        collision=dataclasses.replace(cfg.collision, enable_spheres=True),
    )
    top, state = api.init(host)
    pal = make_pallas_xpbd_step(top, cfg, interpret=True)
    ref = jax.jit(lambda t, s: make_stencil_step(t, cfg)(s, cfg.dt, 96))
    s_ref = ref(top, state)
    s_pal = pal(state, cfg.dt, 96)
    np.testing.assert_allclose(np.asarray(s_pal.x), np.asarray(s_ref.x), atol=2e-5)
    d = np.linalg.norm(np.asarray(s_pal.x) - np.array([0.375, -0.3, 0.0]), axis=1)
    assert d.min() < 0.151  # real contact occurred
