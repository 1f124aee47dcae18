"""Plane contact friction on the position-projection solvers (Verlet /
XPBD) — oracle plane_friction_positions is binding: the substep's
tangential displacement relative to the plane surface is damped by
(1 - friction) at the OR of the projections' pre-clamp contact masks,
once per substep.  Mirrors the Euler convention (v = dx/dt), so all
three solvers now share one friction semantic; plane_velocity gives
conveyor dragging on every solver."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softbodyunity_tpu import api
from softbodyunity_tpu.core.config import (
    CollisionParams,
    SimConfig,
    Solver,
    SpringParams,
)
from softbodyunity_tpu.core.topology import (
    add_colliders,
    cloth_grid,
    from_triangle_mesh,
)
from softbodyunity_tpu.oracle import reference as oracle


@pytest.fixture(autouse=True)
def _restore_x64():
    prev = jax.config.jax_enable_x64
    yield
    jax.config.update("jax_enable_x64", prev)


def _sliding_scene(solver, friction, grid=True):
    cfg = SimConfig(
        solver=solver,
        springs=SpringParams(k_structural=500.0, damping=0.5),
        collision=CollisionParams(enable_plane=True, friction=friction),
        global_damping=0.0,
    )
    host = cloth_grid(8, 8, spacing=0.05, pinned=(), springs=cfg.springs,
                      xpbd=cfg.xpbd, plane_height=0.0, orientation="xz")
    if not grid:
        host = from_triangle_mesh(
            host.positions0, host.triangles, mass=1.0, springs=cfg.springs,
            xpbd=cfg.xpbd, plane_height=0.0, reorder=False, bend=False)
    return host, cfg


def _slide(host, cfg, n_frames=50, dtype=jnp.float32):
    top, state = api.init(host, dtype=dtype)
    v0 = jnp.zeros_like(state.x).at[:, 0].set(1.0)
    state = state.replace(v=v0, x_prev=state.x - cfg.dt * v0)
    for _ in range(n_frames):
        state = api.step(top, cfg, state)
    return state


@pytest.mark.parametrize("solver", [Solver.SEMI_IMPLICIT_EULER,
                                    Solver.VERLET, Solver.XPBD])
@pytest.mark.parametrize("grid", [True, False])
def test_sliding_cloth_decelerates(solver, grid):
    """friction > 0 stops a sliding cloth on every solver and path
    (grid=True exercises stencil/pallas-eligible routing, False the
    banded/jnp path); friction = 0 keeps it sliding."""
    host, cfg = _sliding_scene(solver, friction=0.3, grid=grid)
    s = _slide(host, cfg)
    assert np.abs(np.asarray(s.v)[:, 0]).max() < 0.05
    host0, cfg0 = _sliding_scene(solver, friction=0.0, grid=grid)
    s0 = _slide(host0, cfg0)
    assert np.asarray(s0.v)[:, 0].mean() > 0.9


@pytest.mark.parametrize("solver", [Solver.VERLET, Solver.XPBD])
def test_sliding_oracle_parity_f64(solver):
    """f64 exact tier for the new semantics: device path == oracle on a
    sliding contact scene (both the stencil-routed grid and the banded
    mesh forms)."""
    jax.config.update("jax_enable_x64", True)
    for grid in (True, False):
        host, cfg = _sliding_scene(solver, friction=0.3, grid=grid)
        top, state = api.init(host, dtype=jnp.float64)
        v0 = jnp.zeros_like(state.x).at[:, 0].set(1.0)
        state = state.replace(v=v0, x_prev=state.x - cfg.dt * v0)
        x = host.positions0.copy()
        v = np.asarray(v0, np.float64)
        xp = x - cfg.dt * v
        s = state
        for _ in range(50):
            x, v, xp = oracle.step(host, cfg, x, v, xp)
            s = api.step(top, cfg, s)
        drift = np.max(np.abs(np.asarray(s.x) - x))
        assert drift < 1e-7, f"grid={grid}: {drift:.2e}"


@pytest.mark.parametrize("solver", [Solver.VERLET, Solver.XPBD])
def test_conveyor_drags_projection_solvers(solver):
    """plane_velocity now drags Verlet/XPBD cloth too: a resting cloth on
    a +x conveyor acquires the belt velocity."""
    cfg = SimConfig(
        solver=solver,
        springs=SpringParams(k_structural=500.0, damping=0.5),
        collision=CollisionParams(enable_plane=True, friction=0.4),
        global_damping=0.0,
    )
    host = cloth_grid(8, 8, spacing=0.05, pinned=(), springs=cfg.springs,
                      xpbd=cfg.xpbd, plane_height=0.0, orientation="xz")
    host = add_colliders(host, plane_velocity=[0.5, 0.0, 0.0])
    top, state = api.init(host)
    for _ in range(60):
        state = api.step(top, cfg, state)
    vx = np.asarray(state.v)[:, 0].mean()
    assert vx > 0.4, f"belt didn't drag: vx={vx}"


def test_pinned_never_rubbed():
    """Friction must never move pinned vertices (the contact mask is
    movable-gated on every path)."""
    cfg = SimConfig(
        solver=Solver.VERLET,
        springs=SpringParams(k_structural=500.0, damping=0.5),
        collision=CollisionParams(enable_plane=True, friction=0.5),
        global_damping=0.0,
    )
    host = cloth_grid(8, 8, spacing=0.05, pinned=(0, 7), springs=cfg.springs,
                      xpbd=cfg.xpbd, plane_height=0.0, orientation="xz")
    top, state = api.init(host)
    x0 = np.asarray(state.x)
    for _ in range(30):
        state = api.step(top, cfg, state)
    x = np.asarray(state.x)
    np.testing.assert_array_equal(x[0], x0[0])
    np.testing.assert_array_equal(x[7], x0[7])
