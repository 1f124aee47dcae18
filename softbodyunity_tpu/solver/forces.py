"""Spring-force accumulation over edge lists — pure-JAX ops.

Replaces the reference's per-edge C# ``for`` loop ("spring-force accumulation
over edge lists", BASELINE.json:5) with two TPU-friendly formulations:

* :func:`spring_forces_gather` — per-edge force vectors, then a race-free
  per-vertex **gather** over the precomputed incidence table
  (``Topology.incident``).  Each output row is written by exactly one
  logical program, so the same formulation drops straight into a Pallas
  kernel (SURVEY.md §7 "hard parts": scatter-add -> CSR gather).
* :func:`spring_forces_segment` — ``segment_sum`` fallback over the
  endpoint-sorted edge list (XLA scatter path; used as a cross-check twin).

Both mirror :func:`softbodyunity_tpu.oracle.reference.spring_forces` bit-for-
semantics (f32 vs f64 rounding aside).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import SimConfig
from ..core.topology import Topology


@jax.custom_jvp
def safe_sqrt(x):
    """``jnp.sqrt`` with a grad-safe derivative at 0.

    The PRIMAL is literally ``jnp.sqrt`` — compiled output is
    bit-identical to the plain op (the f64-exact oracle tier and the
    Pallas kernel twins pin spring forces to the bit; a
    ``where(safe, sqrt(where(...)))`` rewrite measurably changed XLA
    CPU codegen by ~50 ulps).  Only the JVP differs: sqrt'(0) = inf
    makes the backward pass 0/0-NaN for zero-length spring vectors —
    and truly coincident endpoints happen (a start-inside plane clamp
    snaps neighbouring vertices to the same point; phantom zero-padded
    stencil pairs meet the origin vertex).  The derivative evaluates
    the unsafe lanes at x = 1 and selects 0, so their cotangent is 0
    instead of NaN."""
    return jnp.sqrt(x)


@safe_sqrt.defjvp
def _safe_sqrt_jvp(primals, tangents):
    (x,), (tx,) = primals, tangents
    safe = x > 0.0
    dydx = jnp.where(safe, 0.5 / jnp.sqrt(jnp.where(safe, x, 1.0)), 0.0)
    return jnp.sqrt(x), dydx * tx


def edge_force_vectors(top: Topology, x: jax.Array, v: jax.Array,
                       cfg: SimConfig, alive=None, rest_scale=None):
    """Per-edge Hooke + axial-damper force on endpoint *a* (toward *b*):
    f32[E,3].  ``alive`` (TearParams liveness f32[E]) silences torn edges;
    ``rest_scale`` (PlasticityParams f32[E]) rescales the rest lengths."""
    a = top.edges[:, 0]
    b = top.edges[:, 1]
    d = x[b] - x[a]
    # grad-safe norm (bit-identical forward): safe_sqrt fixes the
    # sqrt'(0) backward NaN, and selecting the RESULT of the 1/max
    # division zeroes the 1e12-scale inv_len that otherwise rides
    # backward products into overflow for exactly-coincident endpoints
    # (a start-inside plane clamp snaps neighbours to the same point).
    # Unsafe is d2 == 0 EXACTLY: any positive threshold would rewrite
    # the oracle's d/max(length, 1e-12) restoring force on COLLAPSED
    # springs (rest-zero stitches legitimately reach ~0 lengths).
    d2 = jnp.sum(d * d, axis=1)
    # keyed on d, not d2: f32 underflow makes d2 == 0 with d != 0, and
    # those lanes legitimately carry the oracle's eps-clamped force
    safe = jnp.any(d != 0.0, axis=1)
    length = safe_sqrt(d2)
    inv_len = jnp.where(safe, 1.0 / jnp.maximum(length, 1e-12), 0.0)
    n = d * inv_len[:, None]
    rel_v = jnp.einsum("ej,ej->e", v[b] - v[a], n,
                       precision=jax.lax.Precision.HIGHEST)
    rest = (top.rest_length if rest_scale is None
            else top.rest_length * rest_scale)
    fmag = top.edge_stiffness * (length - rest) + cfg.springs.damping * rel_v
    if alive is not None:
        fmag = fmag * alive
    return fmag[:, None] * n


def spring_forces_gather(top: Topology, x: jax.Array, v: jax.Array,
                         cfg: SimConfig, alive=None, rest_scale=None):
    """Race-free incidence-gather accumulation: f32[N,3]."""
    f_edge = edge_force_vectors(top, x, v, cfg, alive=alive,
                                rest_scale=rest_scale)
    # ghost row: padded incidence entries (id == E) gather zero force
    f_pad = jnp.concatenate([f_edge, jnp.zeros((1, 3), f_edge.dtype)], axis=0)
    gathered = f_pad[top.incident]                      # [N, D, 3]
    return jnp.einsum("nd,ndj->nj", top.incident_sign, gathered,
                      precision=jax.lax.Precision.HIGHEST)


def spring_forces_segment(top: Topology, x: jax.Array, v: jax.Array, cfg: SimConfig):
    """segment_sum twin (sorted-edge scatter path)."""
    f_edge = edge_force_vectors(top, x, v, cfg)
    n = x.shape[0]
    fa = jax.ops.segment_sum(f_edge, top.edges[:, 0], num_segments=n)
    fb = jax.ops.segment_sum(-f_edge, top.edges[:, 1], num_segments=n)
    return fa + fb


def self_collision_forces_dense_mxu(x: jax.Array, radius: float, stiffness: float):
    """MXU-native pairwise repulsion — the TPU-first self-collision for
    small-per-scene-N batched workloads (BASELINE.json:11).

    Identity with the oracle rule: with w_ij = k*(r-d_ij)/d_ij over active
    pairs,  f_i = (sum_j w_ij) x_i - (W @ x)_i.  Both the Gram matrix
    (d^2 = |xi|^2+|xj|^2-2 xi.xj) and W@x are batched matmuls that run on
    the 128x128 systolic array; no sort, no gather — TPU gathers cost ~10ms
    per [1024x1k] lookup while these matmuls are microseconds.  Positions
    are centered first so the Gram cancellation stays well-conditioned in
    f32.  Crossover vs the sort-based hash is ~2-4k vertices/scene; above
    that use method="hash".
    """
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    sq = jnp.sum(xc * xc, axis=-1)                            # [N]
    # Raised precision is load-bearing: the TPU MXU's DEFAULT single bf16
    # pass leaves ~1e-3 absolute error in the Gram matrix, which the
    # |xi|^2+|xj|^2 cancellation turns into garbage d^2 for close pairs ->
    # (r-d)/d blows up -> NaN within a few frames (observed).  HIGH
    # (3-pass bf16, ~f32-accurate) is measured sufficient — 1000-frame
    # 256-scene TPU run settles calmly (|v| decaying, no penetration) —
    # and is ~17% faster end-to-end than HIGHEST's 6 passes on the
    # MXU-bound batch workload (91k vs 78k env-steps/s/chip).
    gram = jnp.dot(
        xc, xc.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH,
    )
    d2 = sq[:, None] + sq[None, :] - 2.0 * gram
    n_v = x.shape[0]
    eye = jnp.eye(n_v, dtype=bool)
    # cancellation floor: clamp a radius-relative epsilon, not 1e-24, so a
    # residually-negative d2 can't fabricate a near-zero distance
    d = jnp.sqrt(jnp.maximum(d2, (1e-3 * radius) ** 2))
    active = (d < radius) & (~eye)
    w = jnp.where(active, stiffness * (radius - d) / d, 0.0)  # [N,N] >= 0
    row = jnp.sum(w, axis=1)                                  # [N]
    wx = jnp.dot(
        w, xc, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH,
    )
    return row[:, None] * xc - wx


def self_collision_forces_dense(x: jax.Array, radius: float, stiffness: float):
    """Brute-force O(N^2) pairwise repulsion — jnp twin of the oracle rule,
    used for small scenes and as the hash-grid test oracle."""
    diff = x[None, :, :] - x[:, None, :]
    dist2 = jnp.sum(diff * diff, axis=-1)
    dist = jnp.sqrt(dist2)
    n_v = x.shape[0]
    eye = jnp.eye(n_v, dtype=bool)
    dist = jnp.where(eye, jnp.inf, dist)
    overlap = radius - dist
    active = overlap > 0.0
    dirs = diff / jnp.maximum(dist, 1e-12)[:, :, None]
    f = -(stiffness * jnp.where(active, overlap, 0.0))[:, :, None] * dirs
    return jnp.sum(f, axis=1)
