"""Topology builder tests (SURVEY.md C1): edge classes, rest lengths,
incidence correctness, tet volumes, pinning."""

import numpy as np
import pytest

from softbodyunity_tpu.core.topology import (
    EDGE_BEND,
    EDGE_SHEAR,
    EDGE_STRUCTURAL,
    cloth_grid,
    tet_cube,
)


def test_cloth_grid_edge_counts():
    nx, ny = 5, 4
    top = cloth_grid(nx, ny, shear=True, bend=True)
    e = top.edges
    cls = top.edge_class
    n_struct = (nx - 1) * ny + (ny - 1) * nx
    n_shear = 2 * (nx - 1) * (ny - 1)
    n_bend = (nx - 2) * ny + (ny - 2) * nx
    assert (cls == EDGE_STRUCTURAL).sum() == n_struct
    assert (cls == EDGE_SHEAR).sum() == n_shear
    assert (cls == EDGE_BEND).sum() == n_bend
    assert e.shape == (n_struct + n_shear + n_bend, 2)
    # no duplicate edges
    pairs = {tuple(sorted(p)) for p in e.tolist()}
    assert len(pairs) == e.shape[0]


def test_cloth_grid_rest_lengths():
    top = cloth_grid(4, 4, spacing=0.1, shear=True, bend=True)
    rl = top.rest_length
    cls = top.edge_class
    assert np.allclose(rl[cls == EDGE_STRUCTURAL], 0.1)
    assert np.allclose(rl[cls == EDGE_SHEAR], 0.1 * np.sqrt(2)), "diagonals"
    assert np.allclose(rl[cls == EDGE_BEND], 0.2)


def test_incidence_table_is_exact():
    top = cloth_grid(6, 5, shear=True, bend=True)
    n = top.positions0.shape[0]
    e = top.edges.shape[0]
    # reconstruct degree per vertex from the edge list
    deg = np.zeros(n, dtype=int)
    for a, b in top.edges:
        deg[a] += 1
        deg[b] += 1
    real = top.incident < e
    assert (real.sum(axis=1) == deg).all()
    # every real entry agrees with the edge list and carries the right sign
    for vi in range(n):
        for j in range(top.incident.shape[1]):
            ei = top.incident[vi, j]
            if ei == e:
                assert top.incident_sign[vi, j] == 0.0
                continue
            a, b = top.edges[ei]
            if top.incident_sign[vi, j] == 1.0:
                assert a == vi
            else:
                assert b == vi and top.incident_sign[vi, j] == -1.0


def test_pinning_sets_inv_mass_zero():
    top = cloth_grid(8, 8, pinned=("tl", "tr"))
    assert top.inv_mass[0] == 0.0
    assert top.inv_mass[7] == 0.0
    assert (top.inv_mass > 0).sum() == 62


def test_tet_cube_volumes_positive_and_fill_cells():
    n = 4
    top = tet_cube(n, spacing=0.1)
    assert top.tets.shape[0] == 5 * (n - 1) ** 3
    assert (top.rest_volume > 0).all(), "consistent tet orientation"
    cell_vol = 0.1**3 * (n - 1) ** 3
    assert np.isclose(top.rest_volume.sum(), cell_vol, rtol=1e-10), (
        "5-tet decomposition tiles the cube exactly"
    )


def test_tet_cube_edges_unique_sorted():
    top = tet_cube(3)
    pairs = {tuple(p) for p in top.edges.tolist()}
    assert len(pairs) == top.edges.shape[0]
    assert (top.edges[:, 0] < top.edges[:, 1]).all()
