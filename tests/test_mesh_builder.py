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
