"""Dynamic simulation state.

The reference keeps its dynamic state as C# ``Vector3[]`` fields mutated in
place each frame and copied into ``Mesh.vertices`` ("C# per-vertex mesh
mutation", BASELINE.json:5).  The rebuild keeps state as an immutable pytree
of SoA float32 arrays resident in HBM (BASELINE.json:5 "SoA float32 particle
arrays"); ``step`` is a pure function ``State -> State``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class State:
    """Per-vertex dynamic arrays, shape ``[N, 3]`` float32.

    ``x_prev`` is the previous-substep position: the Verlet integrator's
    history term (BASELINE.json:5 "Euler / Verlet") and XPBD's
    velocity-recovery anchor; the Euler path carries it unused (keeping the
    pytree structure solver-independent so one compiled ``step`` signature
    serves all solvers).
    """

    x: jax.Array       # f32[N, 3] positions
    v: jax.Array       # f32[N, 3] velocities
    x_prev: jax.Array  # f32[N, 3] previous positions
    # Edge liveness for tearing (TearParams): f32[E] of {0,1}, or None when
    # tearing is off (None keeps the pytree minimal; api.step populates it
    # lazily — outside jit — the first time a tearing config is stepped).
    edge_alive: "jax.Array | None" = None
    # Rest-length scale for plastic deformation (PlasticityParams):
    # f32[E] starting at 1.0, or None when plasticity is off (populated
    # lazily by api.step like edge_alive).
    rest_scale: "jax.Array | None" = None
    # Per-cluster rotation quaternions (wxyz) for shape matching
    # (ShapeMatchParams): f32[K, 4] starting at identity, or None when
    # shape matching is off (populated lazily by api.step).  Warm-starts
    # the rotation extraction each substep.
    cluster_quat: "jax.Array | None" = None

    @property
    def n_vertices(self) -> int:
        return self.x.shape[-2]

    def replace(self, **kw) -> "State":
        return dataclasses.replace(self, **kw)


def make_state(positions, dtype=jnp.float32) -> State:
    """Initial rest state: zero velocity, ``x_prev = x``."""
    x = jnp.asarray(positions, dtype=dtype)
    return State(x=x, v=jnp.zeros_like(x), x_prev=x)
