"""Differentiable physics: optimize the initial throw velocity of a free
cloth so its center of mass lands on a target after one simulated second —
``jax.grad`` straight through the solver (the jnp/stencil paths are pure
JAX; something the reference's C# engine cannot do).

    python examples/05_differentiable_throw.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from softbodyunity_tpu import api
from softbodyunity_tpu.core.config import CollisionParams, SimConfig, SpringParams
from softbodyunity_tpu.core.topology import cloth_grid
from softbodyunity_tpu.solver.step import step_scan


def main(n_iters=60, n_substeps=256):
    cfg = SimConfig(
        springs=SpringParams(k_structural=500.0, k_shear=250.0, damping=0.5),
        collision=CollisionParams(enable_plane=False),
        global_damping=0.1,
    )
    host = cloth_grid(
        12, 12, spacing=0.05, shear=True, pinned=(),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-100.0,
        orientation="xz",
    )
    top, state = api.init(host)
    target = jnp.array([1.0, 0.5, 0.4])

    @jax.jit
    def loss(v0):
        s = state.replace(v=jnp.broadcast_to(v0, state.v.shape))
        s = step_scan(top, cfg, s, cfg.dt, n_substeps)
        return jnp.sum((jnp.mean(s.x, axis=0) - target) ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    v = jnp.zeros(3)
    for i in range(n_iters):
        l, g = vg(v)
        v = v - 1.0 * g
        if i % 10 == 0:
            print(f"iter {i:3d}  loss {float(l):.6f}  throw v {np.round(v, 3)}")
    print(f"final loss {float(loss(v)):.6f}  optimized throw velocity {np.round(v, 4)}")


import numpy as np  # noqa: E402  (used in prints)

if __name__ == "__main__":
    main()
