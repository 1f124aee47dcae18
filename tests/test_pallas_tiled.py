"""Row-tiled Pallas kernel vs twins (grids beyond VMEM capacity)."""

import numpy as np
import pytest

import jax

from softbodyunity_tpu import api
from softbodyunity_tpu.core.config import CollisionParams, SimConfig, SpringParams
from softbodyunity_tpu.core.topology import cloth_grid
from softbodyunity_tpu.kernels.pallas_substep import make_pallas_step
from softbodyunity_tpu.kernels.pallas_tiled import make_tiled_step
from softbodyunity_tpu.kernels.stencil import make_stencil_step


def _scene():
    cfg = SimConfig(
        springs=SpringParams(k_structural=500.0, k_shear=250.0, k_bend=100.0, damping=0.6),
        collision=CollisionParams(enable_plane=True, friction=0.2),
        global_damping=0.3,
    )
    # plane below the cloth's reach: contact chaos would otherwise amplify
    # legitimate rsqrt-level rounding differences past any fixed tolerance
    host = cloth_grid(
        16, 24, spacing=0.05, shear=True, bend=True, pinned=("tl", "tr"),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-2.5, orientation="xy",
    )
    return host, cfg


@pytest.mark.parametrize("tile", [8, 24])
def test_tiled_matches_untiled_pallas(tile):
    host, cfg = _scene()
    top, state = api.init(host)
    tiled = make_tiled_step(top, cfg, tile=tile, interpret=True)
    whole = make_pallas_step(top, cfg, interpret=True)
    s_t = tiled(state, cfg.dt, 48)
    s_w = whole(state, cfg.dt, 48)
    np.testing.assert_allclose(np.asarray(s_t.x), np.asarray(s_w.x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_t.v), np.asarray(s_w.v), atol=1e-4)


def test_tiled_matches_stencil():
    host, cfg = _scene()
    top, state = api.init(host)
    tiled = make_tiled_step(top, cfg, tile=8, interpret=True)
    ref = jax.jit(lambda t, s: make_stencil_step(t, cfg)(s, cfg.dt, 48))
    s_t = tiled(state, cfg.dt, 48)
    s_r = ref(top, state)
    np.testing.assert_allclose(np.asarray(s_t.x), np.asarray(s_r.x), atol=5e-5)


def test_tiled_gates():
    host, cfg = _scene()
    top, _ = api.init(host)
    with pytest.raises(ValueError):
        make_tiled_step(top, cfg, tile=7)  # 24 % 7 != 0


def test_tiled_sphere_matches_untiled():
    import dataclasses

    host, cfg = _scene()
    host.sphere_centers = np.array([[0.55, -0.35, 0.0]])
    host.sphere_radii = np.array([0.2])
    cfg = cfg.replace(
        collision=dataclasses.replace(cfg.collision, enable_spheres=True)
    )
    top, state = api.init(host)
    tiled = make_tiled_step(top, cfg, tile=8, interpret=True)
    whole = make_pallas_step(top, cfg, interpret=True)
    s_t = tiled(state, cfg.dt, 96)
    s_w = whole(state, cfg.dt, 96)
    np.testing.assert_allclose(np.asarray(s_t.x), np.asarray(s_w.x), atol=1e-6)
    d = np.linalg.norm(np.asarray(s_t.x) - np.array([0.55, -0.35, 0.0]), axis=1)
    assert d.min() < 0.201  # real contact occurred


def _xpbd_scene(n_iterations=4):
    import dataclasses
    from softbodyunity_tpu.core.config import Solver, XPBDParams

    host, cfg = _scene()
    cfg = cfg.replace(
        solver=Solver.XPBD,
        xpbd=XPBDParams(compliance_distance=1e-6, compliance_bend=5e-4,
                        n_iterations=n_iterations, relaxation=1.0),
    )
    return host, cfg


@pytest.mark.parametrize("n_iterations", [4, 8])
def test_tiled_xpbd_matches_stencil(n_iterations):
    from softbodyunity_tpu.core.topology import cloth_grid
    from softbodyunity_tpu.kernels.pallas_tiled import make_tiled_xpbd_step

    host, cfg = _xpbd_scene(n_iterations)
    if n_iterations == 8:
        # halo = 16 rows: needs a taller grid so tiling still happens
        host = cloth_grid(
            16, 32, spacing=0.05, shear=True, bend=True, pinned=("tl", "tr"),
            springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-2.5,
            orientation="xy",
        )
    top, state = api.init(host)
    tile = 8 if n_iterations == 4 else 16
    tiled = make_tiled_xpbd_step(top, cfg, tile=tile, interpret=True)
    ref = jax.jit(lambda t, s: make_stencil_step(t, cfg)(s, cfg.dt, 48))
    s_t = tiled(state, cfg.dt, 48)
    s_r = ref(top, state)
    np.testing.assert_allclose(np.asarray(s_t.x), np.asarray(s_r.x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_t.v), np.asarray(s_r.v), atol=1e-3)


def test_tiled_xpbd_halo_gate():
    from softbodyunity_tpu.kernels.pallas_tiled import make_tiled_xpbd_step

    host, cfg = _xpbd_scene(8)   # halo = 16 rows
    top, _ = api.init(host)
    with pytest.raises(ValueError):
        make_tiled_xpbd_step(top, cfg, tile=8)  # tile < halo


def test_tiled_verlet_matches_untiled():
    from softbodyunity_tpu.core.config import Solver
    from softbodyunity_tpu.kernels.pallas_substep import make_pallas_verlet_step
    from softbodyunity_tpu.kernels.pallas_tiled import make_tiled_verlet_step

    host, cfg = _scene()
    cfg = cfg.replace(
        solver=Solver.VERLET,
        springs=SpringParams(k_structural=500.0, k_shear=250.0,
                             k_bend=100.0, damping=0.1),
    )
    top, state = api.init(host)
    tiled = make_tiled_verlet_step(top, cfg, tile=8, interpret=True)
    whole = make_pallas_verlet_step(top, cfg, interpret=True)
    s_t = tiled(state, cfg.dt, 64)
    s_w = whole(state, cfg.dt, 64)
    np.testing.assert_allclose(np.asarray(s_t.x), np.asarray(s_w.x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_t.v), np.asarray(s_w.v), atol=1e-4)
