"""contact_impulses: per-collider reaction impulses for two-way coupling
(utils/profiling.py; resolve semantics are the oracle's, so parity is
checked against a NumPy recomputation with oracle resolves)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softbodyunity_tpu import api
from softbodyunity_tpu.core.config import (
    CollisionParams,
    SimConfig,
    SpringParams,
)
from softbodyunity_tpu.core.topology import cloth_grid
from softbodyunity_tpu.oracle import reference as oracle
from softbodyunity_tpu.utils.profiling import contact_impulses


@pytest.fixture(autouse=True)
def _restore_x64():
    prev = jax.config.jax_enable_x64
    yield
    jax.config.update("jax_enable_x64", prev)


def test_resting_cloth_reports_its_weight():
    """A cloth resting flat on the ground plane: the plane's contact
    impulse over dt equals the supported weight M*g upward."""
    cfg = SimConfig(
        springs=SpringParams(damping=0.5),
        collision=CollisionParams(enable_plane=True, friction=0.3),
        global_damping=1.0,
    )
    host = cloth_grid(
        8, 8, spacing=0.05, mass=0.25, shear=True, bend=True,
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=0.0,
        origin=(0.0, 0.001, 0.0), orientation="xz",
    )
    top, state = api.init(host)
    for _ in range(120):
        state = api.step(top, cfg, state)  # settle onto the plane
    imp = contact_impulses(top, cfg, state)
    force = np.asarray(imp["plane"]) / cfg.dt
    weight = 64 * 0.25 * 9.81
    assert force[1] == pytest.approx(weight, rel=0.05)
    assert abs(force[0]) < 0.05 * weight and abs(force[2]) < 0.05 * weight


def test_draped_sphere_carries_the_load():
    """Cloth draped over a sphere: the sphere's upward impulse carries
    most of the cloth weight the plane doesn't."""
    cfg = SimConfig(
        springs=SpringParams(k_structural=400.0, k_shear=200.0,
                             k_bend=80.0, damping=0.5),
        collision=CollisionParams(enable_plane=False, enable_spheres=True,
                                  friction=0.5),
        global_damping=1.0,
    )
    host = cloth_grid(
        12, 12, spacing=0.05, mass=0.1, shear=True, bend=True,
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-10.0,
        origin=(0.0, 0.35, 0.0), orientation="xz",
        sphere_centers=np.array([[0.275, 0.0, 0.275]]),
        sphere_radii=np.array([0.3]),
    )
    top, state = api.init(host)
    for _ in range(90):
        state = api.step(top, cfg, state)
    imp = contact_impulses(top, cfg, state)
    f = np.asarray(imp["spheres"])[0] / cfg.dt
    assert "plane" not in imp
    # the sphere supports a meaningful share of the 14.1 N total weight
    assert f[1] > 3.0


def test_parity_with_oracle_resolves_f64():
    """Device impulse == the same Σ m·Δv computed with the binding NumPy
    oracle resolves on predicted velocities (f64 exact tier)."""
    jax.config.update("jax_enable_x64", True)
    cfg = SimConfig(
        springs=SpringParams(),
        collision=CollisionParams(enable_plane=True, enable_spheres=True,
                                  friction=0.2, restitution=0.1),
    )
    host = cloth_grid(
        6, 6, spacing=0.1, mass=0.3, shear=True, bend=True,
        pinned=("tl",), springs=cfg.springs, xpbd=cfg.xpbd,
        plane_height=-0.18, orientation="xz",
        sphere_centers=np.array([[0.25, -0.12, 0.25]]),
        sphere_radii=np.array([0.15]),
    )
    top, state = api.init(host, dtype=jnp.float64)
    for _ in range(25):
        state = api.step(top, cfg, state)
    imp = contact_impulses(top, cfg, state)

    x = np.asarray(state.x).copy()
    v = np.asarray(state.v).copy()
    movable = np.asarray(host.inv_mass) > 0
    m = np.where(movable, 1.0 / np.maximum(np.asarray(host.inv_mass), 1e-12), 0.0)
    v = v + cfg.dt * np.asarray(cfg.gravity)[None, :]
    x = x + cfg.dt * v
    x1, v1 = oracle.resolve_plane(x, v, host.plane_height,
                                  cfg.collision.restitution,
                                  cfg.collision.friction, movable)
    j_plane = (m[:, None] * (v1 - v)).sum(axis=0)
    x2, v2 = oracle.resolve_spheres(x1, v1, host.sphere_centers,
                                    host.sphere_radii,
                                    cfg.collision.restitution,
                                    cfg.collision.friction, movable)
    j_sph = (m[:, None] * (v2 - v1)).sum(axis=0)
    np.testing.assert_allclose(np.asarray(imp["plane"]), j_plane, atol=1e-12)
    np.testing.assert_allclose(np.asarray(imp["spheres"])[0], j_sph,
                               atol=1e-12)
    assert np.abs(j_plane).sum() > 0 or np.abs(j_sph).sum() > 0


def test_capsule_box_impulses_present_and_finite():
    import dataclasses

    cfg = SimConfig(
        springs=SpringParams(damping=0.5),
        collision=CollisionParams(enable_plane=False, enable_capsules=True,
                                  enable_boxes=True, friction=0.3),
        global_damping=0.5,
    )
    host = cloth_grid(
        10, 10, spacing=0.05, mass=0.1, shear=True, bend=True,
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-10.0,
        origin=(0.0, 0.3, 0.0), orientation="xz",
    )
    host.capsule_p0 = np.array([[0.0, 0.05, 0.225]])
    host.capsule_p1 = np.array([[0.45, 0.05, 0.225]])
    host.capsule_radii = np.array([0.12])
    host.box_centers = np.array([[0.225, -0.05, 0.05]])
    host.box_half_extents = np.array([[0.1, 0.1, 0.1]])
    host.box_rotations = np.eye(3)[None]
    top, state = api.init(host)
    for _ in range(80):
        state = api.step(top, cfg, state)
    imp = contact_impulses(top, cfg, state)
    assert set(imp) == {"capsules", "boxes"}
    assert np.isfinite(np.asarray(imp["capsules"])).all()
    assert np.isfinite(np.asarray(imp["boxes"])).all()
    # something is resting on the capsule: upward support impulse
    assert float(np.asarray(imp["capsules"])[0, 1]) > 0.0


def test_contact_impulses_batched_matches_per_scene():
    from softbodyunity_tpu.parallel import batch
    from softbodyunity_tpu.utils.profiling import contact_impulses_batched

    cfg = SimConfig(
        springs=SpringParams(damping=0.5),
        collision=CollisionParams(enable_plane=True, friction=0.3),
        global_damping=1.0,
    )
    host = cloth_grid(
        6, 6, spacing=0.05, mass=0.25, shear=True, bend=True,
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=0.0,
        origin=(0.0, 0.001, 0.0), orientation="xz",
    )
    top, state = api.init(host)
    for _ in range(60):
        state = api.step(top, cfg, state)
    states = batch.batch_state(state, 3)
    # batch_state zeroes velocities; rebuild with the settled state's v
    states = states.replace(v=jnp.broadcast_to(state.v[None], states.v.shape))
    got = contact_impulses_batched(top, cfg, states)
    want = contact_impulses(top, cfg, state)
    assert got["plane"].shape == (3, 3)
    for b in range(3):
        np.testing.assert_allclose(
            np.asarray(got["plane"][b]), np.asarray(want["plane"]), atol=1e-6
        )
