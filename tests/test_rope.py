"""Rope / rod primitive (core/topology.py::rope): a 1D chain with
structural + bend springs.  Not named by the BASELINE configs (the Unity
analogue is a chain of spring joints); semantics are pinned by the same
oracle machinery as every other topology — the `rope_swing` preset is in
the f64 exact-parity and golden tiers."""

import numpy as np
import pytest

from softbodyunity_tpu import api
from softbodyunity_tpu.core.config import SimConfig, Solver, SpringParams
from softbodyunity_tpu.core.topology import (
    EDGE_BEND,
    EDGE_STRUCTURAL,
    rope,
)
from softbodyunity_tpu.models import presets


def test_rope_builder_shapes():
    host = rope(10, spacing=0.1, pinned=("start", "end", 5))
    assert host.positions0.shape == (10, 3)
    # 9 structural + 8 bend edges
    assert host.edges.shape == (17, 2)
    assert (host.edge_class == EDGE_STRUCTURAL).sum() == 9
    assert (host.edge_class == EDGE_BEND).sum() == 8
    assert host.inv_mass[0] == 0.0
    assert host.inv_mass[9] == 0.0
    assert host.inv_mass[5] == 0.0
    assert host.inv_mass[1] > 0.0
    # hanging default: along -y
    np.testing.assert_allclose(host.positions0[-1], [0.0, -0.9, 0.0],
                               atol=1e-12)


def test_rope_builder_validation():
    with pytest.raises(ValueError):
        rope(1)
    with pytest.raises(ValueError):
        rope(5, pinned=("top",))
    with pytest.raises(ValueError):
        rope(5, pinned=(9,))


def test_rope_is_fully_banded():
    """Chain deltas are {1, 2}: the banded fast path must cover every edge
    (zero residual), so ropes never hit the slow gather path."""
    host, _cfg = presets.build("rope_swing")
    top, _state = api.init(host)
    g = top.offset_groups
    assert g is not None
    assert g.n_residual == 0
    assert sorted(int(d) for d in g.deltas) == [1, 2]


def test_rope_swings_down_and_keeps_length():
    """The horizontal pinned rope swings below its anchor; total chain
    length stays within stretch tolerance of rest length."""
    host, cfg = presets.build("rope_swing")
    top, state = api.init(host)
    x0 = np.asarray(state.x)
    rest_len = np.linalg.norm(np.diff(host.positions0, axis=0), axis=1).sum()
    for _ in range(150):
        state = api.step(top, cfg, state)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    np.testing.assert_array_equal(x[0], x0[0])          # pin bit-frozen
    assert x[-1, 1] < -0.8                              # end swung down
    # a pendulum: the free end stays within rope length of the anchor
    assert np.linalg.norm(x[-1] - x0[0]) < 1.05 * rest_len
    length = np.linalg.norm(np.diff(x, axis=0), axis=1).sum()
    assert abs(length - rest_len) / rest_len < 0.08


@pytest.mark.parametrize("solver", [Solver.VERLET, Solver.XPBD])
def test_rope_other_solvers_stable(solver):
    host, cfg = presets.build("rope_swing")
    cfg = cfg.replace(solver=solver)
    top, state = api.init(host)
    for _ in range(60):
        state = api.step(top, cfg, state)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    assert x[-1, 1] < -0.2


def test_rope_between_points():
    host = rope(5, p0=(1.0, 2.0, 3.0), p1=(2.0, 2.0, 3.0), pinned=())
    np.testing.assert_allclose(host.positions0[0], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(host.positions0[-1], [2.0, 2.0, 3.0])
    d = np.linalg.norm(np.diff(host.positions0, axis=0), axis=1)
    np.testing.assert_allclose(d, 0.25, atol=1e-12)
