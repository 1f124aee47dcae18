"""Arbitrary-triangle-mesh builder (the 'feed any Unity Mesh' analogue):
edge/bend extraction, oracle parity, banded coverage after BFS reorder."""

import numpy as np
import pytest

import jax.numpy as jnp

from softbodyunity_tpu import api
from softbodyunity_tpu.core.config import CollisionParams, SimConfig
from softbodyunity_tpu.core.topology import (
    EDGE_BEND,
    EDGE_STRUCTURAL,
    cloth_grid,
    from_triangle_mesh,
)
from softbodyunity_tpu.oracle import reference as oracle


def _irregular_disc(n_rings=6, segs=12):
    """A fan/ring triangulated disc — genuinely non-lattice topology."""
    pts = [(0.0, 0.0, 0.0)]
    tris = []
    for r in range(1, n_rings + 1):
        for s in range(segs):
            a = 2 * np.pi * s / segs
            pts.append((r * 0.05 * np.cos(a), 0.0, r * 0.05 * np.sin(a)))

    def vid(r, s):
        return 0 if r == 0 else 1 + (r - 1) * segs + (s % segs)

    for s in range(segs):
        tris.append((vid(0, 0), vid(1, s), vid(1, s + 1)))
    for r in range(1, n_rings):
        for s in range(segs):
            tris.append((vid(r, s), vid(r + 1, s), vid(r + 1, s + 1)))
            tris.append((vid(r, s), vid(r + 1, s + 1), vid(r, s + 1)))
    return np.array(pts), np.array(tris)


def test_edge_extraction_counts():
    pts, tris = _irregular_disc()
    host = from_triangle_mesh(pts, tris, reorder=False)
    cls = host.edge_class
    # every unique triangle edge becomes a structural spring
    eset = set()
    for a, b, c in tris:
        for u, v in ((a, b), (b, c), (c, a)):
            eset.add((min(u, v), max(u, v)))
    assert (cls == EDGE_STRUCTURAL).sum() == len(eset)
    assert (cls == EDGE_BEND).sum() > 0, "interior edges produce bend pairs"
    # no duplicate edges
    pairs = {tuple(e) for e in host.edges.tolist()}
    assert len(pairs) == host.edges.shape[0]


def test_mesh_builder_oracle_parity_f64():
    pts, tris = _irregular_disc()
    cfg = SimConfig(collision=CollisionParams(enable_plane=True))
    host = from_triangle_mesh(
        pts, tris, pinned_ids=(0,), springs=cfg.springs, xpbd=cfg.xpbd,
        plane_height=-0.5,
    )
    import jax

    jax.config.update("jax_enable_x64", True)
    top, state = api.init(host, dtype=jnp.float64)
    x, v, xp = host.positions0.copy(), np.zeros_like(host.positions0), host.positions0.copy()
    s = state
    for _ in range(40):
        x, v, xp = oracle.step(host, cfg, x, v, xp)
        s = api.step(top, cfg, s)
    drift = np.max(np.abs(np.asarray(s.x) - x))
    assert drift < 1e-6, f"irregular mesh f64 drift {drift:.2e}"


def test_reorder_improves_banded_coverage():
    """BFS relabeling concentrates index deltas -> more edges on the
    gather-free banded path."""
    pts, tris = _irregular_disc(n_rings=10, segs=24)
    from softbodyunity_tpu.solver.banded import build_offset_groups

    def coverage(host):
        g = build_offset_groups(
            host.positions0.shape[0], host.edges, host.rest_length,
            host.edge_stiffness, host.edge_compliance, min_count=16,
        )
        return 1.0 - g.n_residual / host.edges.shape[0]

    # scrambled labels = worst case; reorder must recover locality
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(pts))
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(pts))
    host_scrambled = from_triangle_mesh(pts[perm], inv[tris], reorder=False)
    host_reordered = from_triangle_mesh(pts[perm], inv[tris], reorder=True)
    assert coverage(host_reordered) > coverage(host_scrambled)
    assert coverage(host_reordered) > 0.5, (
        f"banded coverage {coverage(host_reordered):.2f}"
    )


def test_pinned_mesh_vertex_stays():
    pts, tris = _irregular_disc()
    cfg = SimConfig(collision=CollisionParams(enable_plane=True))
    host = from_triangle_mesh(
        pts, tris, pinned_ids=(0, 5), springs=cfg.springs, xpbd=cfg.xpbd,
        plane_height=-2.0,
    )
    top, state = api.init(host)
    pinned = host.inv_mass == 0.0
    assert pinned.sum() == 2
    x0 = np.asarray(state.x)
    for _ in range(30):
        state = api.step(top, cfg, state)
    np.testing.assert_array_equal(np.asarray(state.x)[pinned], x0[pinned])


def test_mesh_builder_xpbd_solver():
    """Irregular meshes run under the XPBD solver (general/banded paths),
    matching the oracle in f64."""
    import jax
    from softbodyunity_tpu.core.config import Solver, XPBDParams

    pts, tris = _irregular_disc(n_rings=4, segs=8)
    cfg = SimConfig(
        solver=Solver.XPBD,
        xpbd=XPBDParams(compliance_distance=1e-6, compliance_bend=5e-4,
                        n_iterations=4, relaxation=1.0),
        collision=CollisionParams(enable_plane=True),
    )
    host = from_triangle_mesh(
        pts, tris, pinned_ids=(0,), springs=cfg.springs, xpbd=cfg.xpbd,
        plane_height=-0.4,
    )
    jax.config.update("jax_enable_x64", True)
    top, state = api.init(host, dtype=jnp.float64)
    x, v, xp = host.positions0.copy(), np.zeros_like(host.positions0), host.positions0.copy()
    s = state
    for _ in range(30):
        x, v, xp = oracle.step(host, cfg, x, v, xp)
        s = api.step(top, cfg, s)
    drift = np.max(np.abs(np.asarray(s.x) - x))
    assert drift < 1e-6, f"irregular-mesh XPBD f64 drift {drift:.2e}"


def test_degenerate_rope_grid():
    """nx=2 'rope' grids (no shear/bend room) must build and simulate."""
    host = cloth_grid(2, 30, spacing=0.05, shear=True, bend=True,
                      pinned=("tl", "tr"), orientation="xy", plane_height=-3.0)
    cfg = SimConfig(collision=CollisionParams(enable_plane=True))
    top, state = api.init(host)
    for _ in range(30):
        state = api.step(top, cfg, state)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    assert x[:, 1].min() < -0.5, "rope actually hangs down"


# ---------------------------------------------------------------------------
# from_tet_mesh: arbitrary volumetric meshes
# ---------------------------------------------------------------------------

def _random_tet_blob(n_pts=40, seed=0):
    """A tetrahedralized blob via scipy-free Delaunay substitute: connect a
    jittered grid's cube cells with the 5-tet split (irregular positions =>
    irregular rest lengths/volumes but valid connectivity)."""
    from softbodyunity_tpu.core.topology import tet_cube

    host = tet_cube(3, spacing=0.1)
    rng = np.random.default_rng(seed)
    pos = host.positions0 + 0.02 * rng.standard_normal(host.positions0.shape)
    return pos, np.asarray(host.tets)


def test_from_tet_mesh_reproduces_tet_cube_physics():
    """Feeding tet_cube's own (positions, tets) through from_tet_mesh must
    produce identical physics (same springs/volumes up to vertex
    relabeling): run both 50 f64 oracle steps and compare sorted states."""
    import jax
    from softbodyunity_tpu import api
    from softbodyunity_tpu.core.config import CollisionParams, SimConfig, SpringParams
    from softbodyunity_tpu.core.topology import from_tet_mesh, tet_cube
    from softbodyunity_tpu.solver.step import step_scan

    cfg = SimConfig(
        springs=SpringParams(k_structural=1200.0, damping=1.5),
        collision=CollisionParams(enable_plane=True, friction=0.4),
        global_damping=0.5,
        volume_stiffness=0.5,
    )
    cube = tet_cube(5, spacing=0.08, springs=cfg.springs, xpbd=cfg.xpbd,
                    plane_height=0.0, origin=(0.0, 0.05, 0.0))
    rebuilt = from_tet_mesh(
        cube.positions0, np.asarray(cube.tets), springs=cfg.springs,
        xpbd=cfg.xpbd, plane_height=0.0,
    )
    assert rebuilt.edges.shape == cube.edges.shape
    assert rebuilt.tets.shape == cube.tets.shape
    np.testing.assert_allclose(
        np.sort(rebuilt.rest_volume), np.sort(cube.rest_volume), rtol=1e-12
    )

    top_a, s_a = api.init(cube)
    top_b, s_b = api.init(rebuilt)
    run = lambda t, s, c: jax.jit(
        lambda tt, ss: step_scan(tt, c, ss, c.dt, 64)
    )(t, s)
    xa = np.asarray(run(top_a, s_a, cfg).x)
    xb = np.asarray(run(top_b, s_b, cfg).x)
    # same point set evolves identically regardless of labeling
    np.testing.assert_allclose(
        np.sort(xa, axis=0), np.sort(xb, axis=0), atol=5e-5
    )


def test_from_tet_mesh_irregular_blob():
    """An irregular (jittered) tet mesh simulates stably with volume
    preservation and boundary-face normals."""
    import jax.numpy as jnp
    from softbodyunity_tpu import api
    from softbodyunity_tpu.core.config import CollisionParams, SimConfig, SpringParams
    from softbodyunity_tpu.core.topology import from_tet_mesh
    from softbodyunity_tpu.solver.step import step_scan

    pos, tets = _random_tet_blob()
    cfg = SimConfig(
        springs=SpringParams(k_structural=800.0, damping=1.0),
        collision=CollisionParams(enable_plane=True),
        global_damping=0.5,
        volume_stiffness=0.5,
    )
    host = from_tet_mesh(pos, tets, springs=cfg.springs, xpbd=cfg.xpbd,
                         plane_height=-0.05)
    assert (host.rest_volume > 0).all()      # orientation canonicalized
    assert host.triangles.shape[0] > 0       # boundary faces extracted
    top, state = api.init(host)
    s = step_scan(top, cfg, state, cfg.dt, 96)
    x = np.asarray(s.x)
    assert np.isfinite(x).all()
    assert x[:, 1].min() >= -0.05 - 1e-5
    from softbodyunity_tpu.solver.normals import vertex_normals

    nrm = np.asarray(vertex_normals(top.triangles, s.x))
    lens = np.linalg.norm(nrm, axis=1)
    assert np.all((lens < 1e-6) | (np.abs(lens - 1.0) < 1e-4))


def test_from_tet_mesh_ordering_is_best_of_identity_and_bfs():
    """The builder keeps whichever vertex ordering gives more banded
    (gather-free) coverage: a well-ordered lattice stays FULLY banded (BFS
    would fragment it), and a randomly-relabeled copy is rescued by BFS."""
    from softbodyunity_tpu import api
    from softbodyunity_tpu.core.topology import from_tet_mesh, tet_cube

    base = tet_cube(8, spacing=0.1)
    pos, tets = base.positions0, np.asarray(base.tets)

    def banded_frac(host):
        top, _ = api.init(host)
        g = top.offset_groups
        return 1.0 - g.n_residual / host.edges.shape[0]

    # well-ordered lattice: identity order must be preserved (full banding)
    host = from_tet_mesh(pos, tets)
    assert banded_frac(host) == 1.0

    # random labeling: BFS must recover substantial banded coverage
    rng = np.random.default_rng(0)
    perm = rng.permutation(pos.shape[0])
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    host_shuffled_off = from_tet_mesh(pos[perm], inv[tets], reorder=False)
    host_shuffled_on = from_tet_mesh(pos[perm], inv[tets], reorder=True)
    assert banded_frac(host_shuffled_on) > banded_frac(host_shuffled_off) + 0.3


def test_old_to_new_mapping_exposed():
    """from_triangle_mesh records the BFS relabel so caller-side ids
    (stitch/anchor targets) can be remapped; None when order was kept."""
    import numpy as np
    from softbodyunity_tpu.core.topology import cloth_grid, from_triangle_mesh

    # a scrambled GRID mesh: BFS provably recovers banded structure here
    # (a 42-vertex icosphere never qualifies — no delta group reaches the
    # 32-member banding floor, so its input order is legitimately kept)
    g = cloth_grid(16, 16, spacing=0.05, shear=False, bend=False)
    pos = np.asarray(g.positions0)
    tris = np.asarray(g.triangles)
    rng = np.random.default_rng(3)
    perm = rng.permutation(pos.shape[0])        # scramble the labels
    inv = np.empty_like(perm)
    inv[perm] = np.arange(pos.shape[0])
    host = from_triangle_mesh(pos[perm], inv[tris])
    # scrambled grid labels MUST trigger the BFS relabel — a silent None
    # here would mean the mapping stopped being recorded
    assert host.old_to_new is not None
    # input vertex i sits at new id old_to_new[i] with its position
    np.testing.assert_allclose(
        host.positions0[host.old_to_new], pos[perm], atol=0
    )
    host2 = from_triangle_mesh(pos, tris, reorder=False)
    assert host2.old_to_new is None
