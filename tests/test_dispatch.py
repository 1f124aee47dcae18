"""Dispatch guarantees (VERDICT r1 #5): the benchmark presets must lower to
a real ``pallas_call``, and a degraded fast path must warn, not silently
fall back."""

import numpy as np
import pytest

import jax

from softbodyunity_tpu import api
from softbodyunity_tpu.kernels import dispatch
from softbodyunity_tpu.models import presets


def _lowers_to_pallas(preset_name):
    host, cfg = presets.build(preset_name)
    top, state = api.init(host)
    fn = dispatch.maybe_fast_step(top, cfg, "pallas")
    assert fn is not None, f"{preset_name}: no pallas fast path"
    jaxpr = jax.make_jaxpr(lambda t, s: fn(s, cfg.dt, 2))(top, state)
    assert "pallas_call" in str(jaxpr), f"{preset_name}: no pallas_call in jaxpr"


@pytest.mark.parametrize(
    "preset",
    ["cloth_bench_64k", "softbody_cube_64k", "softbody_cube",
     "softbody_cube_64k_verlet", "voxel_sphere_50k"],
)
def test_presets_lower_to_pallas_call(preset):
    _lowers_to_pallas(preset)


@pytest.mark.slow
def test_1m_preset_lowers_to_pallas_call():
    _lowers_to_pallas("cloth_bench_1m")


def test_grid_solvers_never_fall_to_jnp():
    """For structured grids every (solver, collider, size) combination must
    resolve to SOME fast path under backend=pallas (kernel or stencil) —
    never None (the general jnp path)."""
    import dataclasses

    from softbodyunity_tpu.core.config import Solver, XPBDParams

    host, cfg0 = presets.build("cloth_hanging_sphere")
    top, state = api.init(host)
    for solver in (Solver.SEMI_IMPLICIT_EULER, Solver.VERLET, Solver.XPBD):
        for spheres in (False, True):
            cfg = cfg0.replace(
                solver=solver,
                xpbd=XPBDParams(n_iterations=4),
                collision=dataclasses.replace(
                    cfg0.collision, enable_spheres=spheres
                ),
            )
            fn = dispatch.maybe_fast_step(top, cfg, "pallas")
            assert fn is not None, (solver, spheres)
            jaxpr = str(jax.make_jaxpr(lambda t, s: fn(s, cfg.dt, 2))(top, state))
            assert "pallas_call" in jaxpr, (solver, spheres)


def test_broken_gate_warns_not_silent(monkeypatch, capsys):
    """A deliberately broken kernel gate must produce a stderr warning (and
    a stencil fallback), not a silent perf cliff."""
    from softbodyunity_tpu.kernels import pallas_substep

    def boom(top, cfg, interpret=False):
        raise ValueError("deliberately broken gate")

    monkeypatch.setattr(pallas_substep, "make_pallas_step", boom)
    dispatch._warned.clear()
    host, cfg = presets.build("cloth_32_euler")
    top, _ = api.init(host)
    fn = dispatch.maybe_fast_step(top, cfg, "pallas")
    assert fn is not None  # stencil fallback, not None
    err = capsys.readouterr().err
    assert "deliberately broken gate" in err
    # warned exactly once
    dispatch.maybe_fast_step(top, cfg, "pallas")
    err2 = capsys.readouterr().err
    assert "deliberately broken gate" not in err2
