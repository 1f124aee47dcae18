"""Render-mesh embedding (core/embed.py): the Unity render-sync analogue
(BASELINE.json:5 "per-vertex mesh mutation"; SURVEY.md §1a render-sync row).

Exactness properties that pin the semantics:
* embedding the simulation vertices themselves reproduces them exactly —
  at rest AND after arbitrary deformation (barycentric weight 1 on the
  coinciding corner);
* interior points of a rigidly translated mesh translate exactly;
* surface embeds reconstruct triangle-plane points exactly and carry
  normal offsets through bends.
"""

import numpy as np

import jax.numpy as jnp

from softbodyunity_tpu import api
from softbodyunity_tpu.core.config import (
    CollisionParams,
    SimConfig,
    SpringParams,
)
from softbodyunity_tpu.core.embed import embed_mesh, skin, skin_normals
from softbodyunity_tpu.core.topology import cloth_grid, icosphere_mesh, tet_cube


def _cube_scene(n=5):
    cfg = SimConfig(
        springs=SpringParams(k_structural=400.0, damping=0.4),
        collision=CollisionParams(enable_plane=True),
        volume_stiffness=0.5,
        global_damping=0.5,
    )
    host = tet_cube(
        n, spacing=0.1, mass=0.02, springs=cfg.springs, xpbd=cfg.xpbd,
        plane_height=0.0, origin=(0.0, 0.3, 0.0),
    )
    return host, cfg


def test_tet_embed_sim_vertices_exact_after_deformation():
    """Embedding each sim vertex of the cube lattice is exact at rest and
    tracks the deformed state exactly (weight 1 on the coinciding corner)."""
    host, cfg = _cube_scene()
    emb = embed_mesh(host, host.positions0, host.triangles)
    top, state = api.init(host)
    np.testing.assert_allclose(
        np.asarray(skin(emb, state.x)), np.asarray(state.x),
        rtol=0, atol=1e-6)
    for _ in range(20):
        state = api.step(top, cfg, state, n_substeps=4)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    assert np.abs(x - np.asarray(host.positions0)).max() > 1e-3  # it moved
    np.testing.assert_allclose(
        np.asarray(skin(emb, state.x)), x, rtol=0, atol=1e-6)


def test_tet_embed_interior_rigid_translation():
    """Interior points (tet centroids + random interior samples) translate
    exactly with a rigid translation of the sim state."""
    host, _cfg = _cube_scene()
    rng = np.random.default_rng(0)
    cent = host.positions0[host.tets].mean(axis=1)
    lo = host.positions0.min(0) + 0.01
    hi = host.positions0.max(0) - 0.01
    pts = np.concatenate(
        [cent[:: max(1, len(cent) // 50)],
         rng.uniform(lo, hi, size=(40, 3))])
    emb = embed_mesh(host, pts, np.zeros((0, 3), np.int64))
    x0 = jnp.asarray(host.positions0, jnp.float32)
    p0 = np.asarray(skin(emb, x0))
    np.testing.assert_allclose(p0, pts, rtol=0, atol=1e-5)  # exact at rest
    t = jnp.asarray([0.3, -1.2, 0.07], jnp.float32)
    p1 = np.asarray(skin(emb, x0 + t))
    np.testing.assert_allclose(p1, p0 + np.asarray(t), rtol=0, atol=1e-5)


def test_fine_sphere_follows_coarse_cube():
    """A fine icosphere render mesh embedded in a coarse falling cube stays
    finite, inside the deformed bounding box, and keeps unit normals."""
    host, cfg = _cube_scene(n=4)
    center = host.positions0.mean(0)
    sphere_pos, sphere_tri = icosphere_mesh(
        radius=0.12, center=tuple(center), subdivisions=2)
    emb = embed_mesh(host, sphere_pos, sphere_tri)
    top, state = api.init(host)
    for _ in range(25):
        state = api.step(top, cfg, state, n_substeps=4)
    p = np.asarray(skin(emb, state.x))
    assert np.isfinite(p).all()
    x = np.asarray(state.x)
    pad = 0.02
    assert (p >= x.min(0) - pad).all() and (p <= x.max(0) + pad).all()
    n = np.asarray(skin_normals(emb, state.x))
    np.testing.assert_allclose(
        np.linalg.norm(n, axis=1), 1.0, rtol=0, atol=1e-4)


def test_surface_embed_plane_points_and_offset():
    """Cloth surface embedding: triangle-plane points reconstruct exactly;
    offset points sit at the stored distance along the face normal and keep
    it under a rigid translation."""
    cfg = SimConfig(springs=SpringParams())
    host = cloth_grid(
        8, 8, spacing=0.1, shear=True, bend=True, pinned=(),
        springs=cfg.springs, xpbd=cfg.xpbd, orientation="xy",
    )
    tri_pts = host.positions0[host.triangles]              # [F,3,3]
    rng = np.random.default_rng(1)
    f = rng.integers(0, len(tri_pts), size=30)
    b = rng.dirichlet(np.ones(3), size=30)
    on_plane = np.einsum("kc,kcd->kd", b, tri_pts[f])
    a, bb, cc = tri_pts[f, 0], tri_pts[f, 1], tri_pts[f, 2]
    nrm = np.cross(bb - a, cc - a)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    h = rng.uniform(-0.04, 0.04, size=30)
    off_plane = on_plane + h[:, None] * nrm
    emb = embed_mesh(host, np.concatenate([on_plane, off_plane]),
                     np.zeros((0, 3), np.int64))
    x0 = jnp.asarray(host.positions0, jnp.float32)
    p = np.asarray(skin(emb, x0))
    np.testing.assert_allclose(p[:30], on_plane, rtol=0, atol=1e-5)
    np.testing.assert_allclose(p[30:], off_plane, rtol=0, atol=1e-5)
    t = jnp.asarray([1.0, 2.0, -3.0], jnp.float32)
    p2 = np.asarray(skin(emb, x0 + t))
    np.testing.assert_allclose(p2, p + np.asarray(t), rtol=0, atol=2e-5)


def test_embed_validates_inputs():
    host, _cfg = _cube_scene(n=3)
    import pytest

    with pytest.raises(ValueError):
        embed_mesh(host, np.zeros((4, 2)), np.zeros((0, 3), np.int64))
    with pytest.raises(ValueError):
        embed_mesh(host, np.zeros((4, 3)), np.array([[0, 1, 99]]))
