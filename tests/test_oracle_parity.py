"""Golden-trajectory fidelity tests (SURVEY.md C17, §4).

Two tiers:

* **f64 exact parity** — the JAX solver run in float64 must match the NumPy
  oracle to ~1e-9 over 50 frames on every preset: proves the device path
  implements *exactly* the oracle semantics (the "reference trajectory"
  generator standing in for the code-free reference snapshot; SURVEY.md §0).
* **f32 drift** — the production float32 path must stay within the
  BASELINE.json:5 bound (<=1e-3 positional drift over 1k steps at fixed dt)
  on the smooth configs.  Contact-chaotic configs (sphere/self-collision)
  amplify last-bit differences exponentially, so they are held to the f64
  tier plus invariant tests instead (tests/test_invariants.py).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softbodyunity_tpu import api
from softbodyunity_tpu.core.state import State
from softbodyunity_tpu.models import presets
from softbodyunity_tpu.oracle import reference as oracle

# The oracle-in-the-loop tier runs the five BASELINE.json:7-11 workload
# configs (explicit whitelist: scale/benchmark preset variants share these
# solvers but run 16k-1M vertices, where the NumPy oracle takes minutes to
# hours per step; their fidelity is covered by
# test_64k_bench_scene_drift_bound, the block-sparse dense-parity tests,
# and the invariants suite).
PRESETS = [
    "cloth_32_euler",
    "cloth_hanging_sphere",
    "cloth_xpbd",
    "softbody_cube",
    "cloth_batch_rl",
    # merged-topology + stitch semantics (curtain of two sewn panels)
    "curtain_stitched",
    # closed-shell gas volume + per-face pressure force semantics
    "balloon_drop",
    # 1D chain primitive (structural+bend, fully banded)
    "rope_swing",
    # substep-instead-of-iterate XPBD (1 Jacobi iteration, 32 substeps):
    # the semantics of the high-throughput volumetric XPBD regime
    "softbody_cube_xpbd_sub",
]
assert set(PRESETS) <= set(presets.names())


def _run_pair(host, cfg, n_steps, dtype):
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    top, state = api.init(host, dtype=dtype)
    x = host.positions0.copy()
    v = np.zeros_like(x)
    xp = x.copy()
    s = state
    for _ in range(n_steps):
        x, v, xp = oracle.step(host, cfg, x, v, xp)
        s = api.step(top, cfg, s)
    return np.asarray(s.x), x


@pytest.mark.parametrize("name", PRESETS)
def test_f64_exact_parity(name):
    host, cfg = presets.build(name)
    if name == "cloth_batch_rl":
        # oracle self-collision is the dense rule; hash==dense is proven in
        # test_forces.py, here we compare like-for-like
        cfg = cfg.replace(
            self_collision=dataclasses.replace(cfg.self_collision, method="dense")
        )
    got, want = _run_pair(host, cfg, n_steps=50, dtype=jnp.float64)
    drift = np.max(np.abs(got - want))
    # bound is f64 summation-REORDER noise (banded group order vs np.add.at
    # edge order), amplified ~100x by contact chaos on the sphere config; a
    # semantic difference would show up at 1e-3+
    assert drift < 1e-6, f"{name}: f64 drift {drift:.3e}"


@pytest.mark.parametrize("name", ["cloth_32_euler", "softbody_cube"])
def test_f32_drift_short(name):
    host, cfg = presets.build(name)
    got, want = _run_pair(host, cfg, n_steps=100, dtype=jnp.float32)
    drift = np.max(np.abs(got - want))
    assert drift < 1e-4, f"{name}: f32 drift {drift:.3e} over 100 steps"


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,bound",
    [
        # BASELINE.json:5 attaches the <=1e-3/1k-steps bound to the headline
        # Euler cloth scenario; force-based configs meet it with margin.
        ("cloth_32_euler", 1e-3),
        ("softbody_cube", 1e-3),
        # XPBD meets the bound via delta-form accumulation (the Jacobi loop
        # carries the substep's total position change instead of rounding
        # 8 tiny corrections/substep into x): bias went 4.3e-3 -> 2.3e-6
        # over 1k steps (solver/step.py substep_xpbd).
        ("cloth_xpbd", 1e-3),
    ],
)
def test_f32_drift_1k_steps(name, bound):
    host, cfg = presets.build(name)
    got, want = _run_pair(host, cfg, n_steps=1000, dtype=jnp.float32)
    drift = np.max(np.abs(got - want))
    assert drift < bound, f"{name}: f32 drift {drift:.3e} over 1k steps"


@pytest.mark.slow
def test_64k_bench_scene_drift_bound():
    """The BASELINE.json:5 headline bound on the actual benchmark scene:
    <=1e-3 positional drift over 1000 steps at fixed dt, f32 vs f64 (the
    f64 path is oracle-exact per test_f64_exact_parity).  Measured 2.5e-5."""
    jax.config.update("jax_enable_x64", True)
    from softbodyunity_tpu.kernels.stencil import make_stencil_step

    host, cfg = presets.build("cloth_bench_64k")
    run = jax.jit(lambda t, s: make_stencil_step(t, cfg)(s, cfg.dt, 16))
    top32, s32 = api.init(host, dtype=jnp.float32)
    top64, s64 = api.init(host, dtype=jnp.float64)
    worst = 0.0
    for i in range(1000):
        s32 = run(top32, s32)
        s64 = run(top64, s64)
        if (i + 1) % 250 == 0:
            worst = max(worst, float(np.max(np.abs(
                np.asarray(s32.x, np.float64) - np.asarray(s64.x)))))
    assert worst < 1e-3, f"64k bench drift {worst:.3e} over 1k steps"
