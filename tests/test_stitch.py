"""merge_bodies + stitch: multi-body scene assembly and attachment
springs (the 'several soft-body GameObjects, sewn together' analogue).
Validation: structural invariants, f64 oracle parity, and the physical
outcome (a stitched body HANGS from its partner instead of falling)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import softbodyunity_tpu as sb
from softbodyunity_tpu import api
from softbodyunity_tpu.core.config import CollisionParams, SimConfig, Solver
from softbodyunity_tpu.core.topology import (
    EDGE_STRUCTURAL,
    cloth_grid,
    merge_bodies,
    stitch,
)
from softbodyunity_tpu.oracle import reference as oracle


def _two_cloths(cfg, n=6, spacing=0.1):
    """A hanging sheet pinned along its top row, and a free sheet just
    below its hem (both vertical, "xy" orientation)."""
    top_sheet = cloth_grid(
        n, n, spacing=spacing, shear=True, bend=False,
        pinned=("top",), springs=cfg.springs, xpbd=cfg.xpbd,
        plane_height=-10.0, orientation="xy",
    )
    bottom = cloth_grid(
        n, n, spacing=spacing, shear=True, bend=False, pinned=(),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-10.0,
        orientation="xy", origin=(0.0, -n * spacing, 0.0),
    )
    merged = merge_bodies(top_sheet, bottom)
    n_v = n * n
    seam_a = [(n - 1) * n + j for j in range(n)]          # top sheet, last row
    seam_b = [n_v + j for j in range(n)]                   # free sheet, first row
    return merged, seam_a, seam_b, n_v


def test_merge_counts_and_offsets():
    cfg = SimConfig()
    a = cloth_grid(4, 4, spacing=0.1, pinned=("tl",), springs=cfg.springs,
                   xpbd=cfg.xpbd)
    b = cloth_grid(3, 5, spacing=0.1, pinned=(), springs=cfg.springs,
                   xpbd=cfg.xpbd,
                   sphere_centers=[[0.0, -1.0, 0.0]], sphere_radii=[0.3])
    m = merge_bodies(a, b)
    assert m.positions0.shape[0] == 16 + 15
    assert m.edges.shape[0] == a.edges.shape[0] + b.edges.shape[0]
    assert m.triangles.shape[0] == a.triangles.shape[0] + b.triangles.shape[0]
    # second body's indices are offset past the first body's vertices
    b_edges = m.edges[(m.edges >= 16).all(axis=1)]
    assert b_edges.shape[0] == b.edges.shape[0]
    assert m.inv_mass[0] == 0.0 and (m.inv_mass[16:] > 0).all()
    assert m.sphere_centers.shape == (1, 3)
    assert m.grid_shape is None
    # one scene, one floor: first body's plane
    assert m.plane_height == a.plane_height
    # edges stay sorted (lexsort by endpoint) after the merge
    assert (np.lexsort((m.edges[:, 1], m.edges[:, 0]))
            == np.arange(m.edges.shape[0])).all()


def test_merge_sdf_dim_mismatch_raises():
    from softbodyunity_tpu.core.topology import add_colliders
    cfg = SimConfig()
    a = cloth_grid(3, 3, spacing=0.1, springs=cfg.springs, xpbd=cfg.xpbd)
    b = cloth_grid(3, 3, spacing=0.1, springs=cfg.springs, xpbd=cfg.xpbd)
    a = add_colliders(a, sdf_grids=np.zeros((1, 4, 4, 4)),
                      sdf_origins=[[0.0, 0, 0]], sdf_spacings=[0.1])
    b = add_colliders(b, sdf_grids=np.zeros((1, 5, 5, 5)),
                      sdf_origins=[[0.0, 0, 0]], sdf_spacings=[0.1])
    with pytest.raises(ValueError, match="voxel dims"):
        merge_bodies(a, b)


def test_stitch_validation_and_defaults():
    cfg = SimConfig()
    host = cloth_grid(4, 4, spacing=0.1, springs=cfg.springs, xpbd=cfg.xpbd)
    e0 = host.edges.shape[0]
    out = stitch(host, [0, 1], [12, 13])
    assert out.edges.shape[0] == e0 + 2
    assert host.edges.shape[0] == e0, "input must not be modified"
    struct = host.edge_class == EDGE_STRUCTURAL
    new_mask = np.ones(out.edges.shape[0], bool)
    old = {tuple(e) for e in host.edges.tolist()}
    for i, e in enumerate(out.edges.tolist()):
        if tuple(e) in old:
            new_mask[i] = False
    # defaults: mean structural stiffness/compliance, current-distance rest
    np.testing.assert_allclose(
        out.edge_stiffness[new_mask],
        host.edge_stiffness[struct].mean())
    d = np.linalg.norm(host.positions0[12] - host.positions0[0])
    assert np.any(np.isclose(out.rest_length[new_mask], d))
    # sewing seam: rest 0
    seam = stitch(host, [0], [12], rest_length=0.0)
    new_e = [tuple(e) for e in seam.edges.tolist() if tuple(e) not in old]
    assert new_e == [(0, 12)]
    # incidence was rebuilt to include the stitches
    assert seam.incident.shape != host.incident.shape or not np.array_equal(
        seam.incident, host.incident)

    with pytest.raises(ValueError, match="itself"):
        stitch(host, [3], [3])
    with pytest.raises(ValueError, match="out of range"):
        stitch(host, [0], [99])
    with pytest.raises(ValueError, match="already have springs"):
        stitch(host, [0], [1])
    with pytest.raises(ValueError, match="duplicate"):
        stitch(host, [0, 12], [12, 0])


def test_stitched_cloth_hangs_not_falls():
    """The physical point of attachments: a free sheet sewn to a pinned
    sheet's hem hangs from it; unstitched, it falls away."""
    cfg = SimConfig(collision=CollisionParams(enable_plane=True),
                    global_damping=0.5)
    merged, seam_a, seam_b, n_v = _two_cloths(cfg)
    loose_top, loose_state = api.init(merged)
    # stiff seam: six stitches carry the whole lower sheet's weight, so
    # default (mean-structural) stiffness would sag visibly
    sewn = stitch(merged, seam_a, seam_b, rest_length=0.0, stiffness=5e3)
    top, state = api.init(sewn)
    for _ in range(120):
        state = api.step(top, cfg, state)
        loose_state = api.step(loose_top, cfg, loose_state)
    x = np.asarray(state.x)
    xl = np.asarray(loose_state.x)
    assert np.isfinite(x).all()
    # stitched pairs stay flush (sewn seam)
    gap = np.linalg.norm(x[seam_a] - x[seam_b], axis=1)
    assert gap.max() < 0.05, f"seam opened: {gap.max():.3f}"
    # the sewn sheet hangs well above where the loose sheet fell
    assert x[n_v:, 1].min() > xl[n_v:, 1].min() + 0.3


@pytest.mark.parametrize("solver", [Solver.SEMI_IMPLICIT_EULER, Solver.XPBD])
def test_stitched_oracle_parity_f64(solver):
    """Stitches are ordinary edges to every path: f64 device trajectory
    must match the binding oracle exactly (<1e-6 over 40 steps)."""
    cfg = SimConfig(solver=solver,
                    collision=CollisionParams(enable_plane=True))
    merged, seam_a, seam_b, _ = _two_cloths(cfg, n=4)
    host = stitch(merged, seam_a, seam_b)
    jax.config.update("jax_enable_x64", True)
    try:
        top, s = api.init(host, dtype=jnp.float64)
        x = host.positions0.copy()
        v = np.zeros_like(x)
        xp = host.positions0.copy()
        for _ in range(40):
            x, v, xp = oracle.step(host, cfg, x, v, xp)
            s = api.step(top, cfg, s)
        drift = np.max(np.abs(np.asarray(s.x) - x))
        assert drift < 1e-6, f"stitched {solver} f64 drift {drift:.2e}"
    finally:
        jax.config.update("jax_enable_x64", False)


def test_merged_bodies_batch_and_grad():
    """Merged/stitched scenes flow through the batched stepping surface."""
    from softbodyunity_tpu.parallel.batch import batch_state, step_batched
    cfg = SimConfig(collision=CollisionParams(enable_plane=True))
    merged, seam_a, seam_b, _ = _two_cloths(cfg, n=4)
    host = stitch(merged, seam_a, seam_b)
    top, state = api.init(host)
    jitter = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (3, 3))
    states = batch_state(state, 3, jitter=jitter)
    states = step_batched(top, cfg, states)
    assert np.isfinite(np.asarray(states.x)).all()
    assert np.asarray(states.x).shape[0] == 3


def test_merge_volumetric_and_cloth():
    """merge_bodies offsets TET indices too: a soft cube and a cloth in
    one scene, volume preservation still acting on the cube's tets."""
    from softbodyunity_tpu.core.topology import tet_cube
    cfg = SimConfig(collision=CollisionParams(enable_plane=True))
    cube = tet_cube(3, spacing=0.1, springs=cfg.springs, xpbd=cfg.xpbd,
                    plane_height=-1.0, origin=(0.0, 0.3, 0.0))
    cloth = cloth_grid(4, 4, spacing=0.1, pinned=("top",),
                       springs=cfg.springs, xpbd=cfg.xpbd,
                       orientation="xy", origin=(1.0, 0.0, 0.0))
    m = merge_bodies(cube, cloth)
    n_cube = cube.positions0.shape[0]
    assert m.tets.shape[0] == cube.tets.shape[0]
    assert m.tets.max() < n_cube, "tet ids must stay inside the cube body"
    np.testing.assert_allclose(m.rest_volume, cube.rest_volume)
    # cloth-second ordering ALSO works reversed (tets get offset)
    m2 = merge_bodies(cloth, cube)
    assert m2.tets.min() >= cloth.positions0.shape[0]

    top, state = api.init(m)
    for _ in range(20):
        state = api.step(top, cfg, state)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    # the cube kept its volume (PBD projection active through the merge);
    # V = det/6 per tet, same formula as oracle.volume_projection
    xf = x.astype(np.float64)
    t = m.tets
    p0, p1, p2, p3 = xf[t[:, 0]], xf[t[:, 1]], xf[t[:, 2]], xf[t[:, 3]]
    vols = np.einsum("ij,ij->i", np.cross(p1 - p0, p2 - p0), p3 - p0) / 6.0
    assert abs(vols.sum() / cube.rest_volume.sum() - 1.0) < 0.05


def test_stitched_seam_tears():
    """Composition: stitches are ordinary edges, so TearParams rips an
    overloaded seam — the sewn sheet breaks away and falls."""
    from softbodyunity_tpu.core.config import TearParams
    cfg = SimConfig(collision=CollisionParams(enable_plane=True),
                    tear=TearParams(enabled=True, strain_limit=0.03),
                    global_damping=0.2)
    merged, seam_a, seam_b, n_v = _two_cloths(cfg)
    # heavy lower sheet on a weak sparse seam: two stitches only
    host = stitch(merged, seam_a[:2], seam_b[:2], stiffness=50.0)
    host.inv_mass[n_v:] = 1.0 / 5.0     # 5 kg per lower-sheet vertex
    top, state = api.init(host)
    state = api.ensure_tear_state(top, cfg, state)
    for _ in range(150):
        state = api.step(top, cfg, state)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    alive = np.asarray(state.edge_alive)
    assert alive.sum() < alive.shape[0], "seam never tore"
    # the lower sheet broke away toward the floor
    assert x[n_v:, 1].min() < -2.0


def test_anchor_hangs_cloth_elastically():
    """anchor(): a free cloth hung from two world anchors sags to the
    spring equilibrium instead of falling; anchors are pinned phantoms."""
    from softbodyunity_tpu.core.topology import anchor

    cfg = SimConfig(global_damping=2.0)
    n = 6
    host = cloth_grid(
        n, n, spacing=0.1, mass=0.05, shear=True, bend=False, pinned=(),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-10.0,
        orientation="xy",
    )
    corners = [(n - 1) * n, n * n - 1]        # top row ends
    pts = host.positions0[corners] + [0.0, 0.2, 0.0]   # anchors above
    n0 = host.positions0.shape[0]
    host = anchor(host, corners, pts, stiffness=400.0, rest_length=0.0)
    assert host.positions0.shape[0] == n0 + 2
    assert (host.inv_mass[n0:] == 0.0).all()

    top, state = api.init(host)
    for _ in range(150):
        state = api.step(top, cfg, state)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    # anchors never move
    np.testing.assert_array_equal(x[n0:], np.asarray(state.x_prev)[n0:])
    # the cloth hangs near the anchors (rest-0 tether stretches by
    # weight/k, far above the floor at -10)
    assert x[:n0, 1].min() > -2.0
    gap = np.linalg.norm(x[corners] - np.asarray(pts), axis=1).max()
    assert gap < 0.1


def test_anchor_moves_with_move_pins():
    """Elastic drag handle: moving the phantom anchor drags the cloth
    along through the tether spring (vs teleporting the vertex itself)."""
    from softbodyunity_tpu.core.topology import anchor

    cfg = SimConfig(global_damping=2.0, gravity=(0.0, 0.0, 0.0))
    n = 6
    host = cloth_grid(
        n, n, spacing=0.1, mass=0.05, shear=True, bend=False, pinned=(),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-10.0,
        orientation="xy",
    )
    n0 = host.positions0.shape[0]
    host = anchor(host, [0], stiffness=400.0)   # anchored at its own spot
    top, state = api.init(host)
    target = np.array([[1.0, 0.5, 0.0]], np.float32)
    for _ in range(120):
        state = api.move_pins(top, state, target, [n0])
        state = api.step(top, cfg, state)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    # the whole cloth followed the dragged anchor toward +x
    assert x[:n0, 0].mean() > 0.4


def test_anchor_validation():
    from softbodyunity_tpu.core.topology import anchor

    host = cloth_grid(4, 4, spacing=0.1)
    with pytest.raises(ValueError, match="out of range"):
        anchor(host, [999])
    with pytest.raises(ValueError, match="pair 1:1"):
        anchor(host, [0, 1], [[0.0, 0.0, 0.0]])
    assert anchor(host, []) is host
