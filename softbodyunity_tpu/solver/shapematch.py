"""Meshless shape matching — device twin of the oracle's binding
semantics (``oracle/reference.py::shape_match_dx`` /
``extract_rotations``; Muller et al. "Meshless Deformations Based on
Shape Matching" + the 2016 branchless rotation extraction).

Clusters are irregular (any vertex subset), so this is a general jnp
path: the cluster reductions are ``segment_sum`` (race-free scatter-add
the XLA way) and everything else is elementwise VPU work — no matmuls,
so TPU bf16 MXU passes never enter (CLAUDE.md "TPU numerics").  The
fast grid/lattice kernels gate off loudly when shape matching is on
(``kernels/dispatch.py``).

The shape matrix is accumulated about the CURRENT centroid,
``A = sum m_i (x_i - c) q_i^T``, which equals the oracle's uncentered
``sum m_i x_i q_i^T`` exactly in real arithmetic (the rest offsets are
mass-centered so ``sum m_i q_i = 0``) but avoids an ``|x| * eps``
rounding penalty in f32 when the body sits far from the origin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import SimConfig
from ..core.topology import Topology


def _quat_mul(p, q):
    """Batched Hamilton product, wxyz, [K, 4] x [K, 4] -> [K, 4]
    (oracle ``_quat_mul`` twin)."""
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        pw * qw - px * qx - py * qy - pz * qz,
        pw * qx + px * qw + py * qz - pz * qy,
        pw * qy - px * qz + py * qw + pz * qx,
        pw * qz + px * qy - py * qx + pz * qw,
    ], axis=-1)


def _quat_from_rotvec(t):
    """Batched exponential map [K, 3] -> [K, 4] wxyz, series-safe near
    zero (oracle ``_quat_from_rotvec`` twin, branchless)."""
    angle = jnp.linalg.norm(t, axis=-1, keepdims=True)
    small = angle < 1e-12
    axis = t / jnp.where(small, 1.0, angle)
    h = 0.5 * angle
    w = jnp.where(small, 1.0, jnp.cos(h))
    xyz = jnp.where(small, 0.5 * t, jnp.sin(h) * axis)
    return jnp.concatenate([w, xyz], axis=-1)


def _quat_to_matrix(q):
    """Batched unit quaternion (wxyz) -> rotation matrix [K, 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], axis=-1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], axis=-1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)


def extract_rotations(A, quats, iterations: int):
    """Rotation part of each cluster's shape matrix ``A`` f32[K, 3, 3]
    via the warm-started branchless quaternion iteration (oracle
    ``extract_rotations`` twin — identical fixed-iteration recurrence,
    so oracle and device agree to rounding).  ``iterations`` is static
    and small (default 4), so the sweep loop unrolls."""
    q = quats
    for _ in range(iterations):
        R = _quat_to_matrix(q)
        # omega = sum_cols r_i x a_i / (|sum R.A| + 1e-9)
        num = (jnp.cross(R[..., :, 0], A[..., :, 0])
               + jnp.cross(R[..., :, 1], A[..., :, 1])
               + jnp.cross(R[..., :, 2], A[..., :, 2]))
        den = jnp.abs((R * A).sum(axis=(-2, -1)))[..., None] + 1e-9
        qn = _quat_mul(_quat_from_rotvec(num / den), q)
        q = qn / jnp.linalg.norm(qn, axis=-1, keepdims=True)
    return q


# above this many one-hot matrix elements (N * K f32) the dense-matmul
# formulation's HBM traffic outgrows the gathers it replaces; fall back
# to the segment_sum path (64 MB at the threshold)
MXU_ONEHOT_MAX_ELEMS = 2 ** 24


def shape_match_dx(top: Topology, cfg: SimConfig, x, quats):
    """Per-substep shape-matching position correction (oracle
    ``shape_match_dx`` twin): per cluster, current mass centroid ``c``,
    shape matrix ``A = sum m_i (x_i - c) q_i^T`` over movable members,
    rotation from :func:`extract_rotations` warm-started at ``quats``,
    goals ``g_i = R q_i + c``, ``dx_i = stiffness * (g_i - x_i)`` on
    movable members only (zero net momentum: ``sum m_i q_i = 0`` by
    construction in ``enable_shape_matching``).  Returns
    ``(dx f32[N, 3], quats' f32[K, 4])``.

    TPU formulation: the per-cluster reductions and the broadcast-back
    are expressed through a mass-weighted one-hot membership matrix
    ``W f32[N, K]`` — ``[K, N] @ [N, d]`` MXU matmuls replace
    segment_sum scatters, and ``onehot @ per_cluster`` replaces the
    ``[cid]`` gathers (TPU gathers run at ~1% of HBM bandwidth,
    docs/PERF.md).  HIGHEST matmul precision: the A-matrix and centroid
    feed cancellations (``x - c[cid]``, ``g - x``) — bf16 MXU passes
    corrupt those (CLAUDE.md "TPU numerics").  Equal to the oracle in
    real arithmetic; reduction ORDER differs only by f32/f64 rounding.
    Scenes with ``N * K`` beyond ``MXU_ONEHOT_MAX_ELEMS`` take the
    segment_sum path instead."""
    sm = cfg.shape_match
    k = int(top.n_clusters)
    cid_raw = top.cluster_id
    member = (cid_raw >= 0) & (top.inv_mass > 0.0)
    m = jnp.where(member, 1.0 / jnp.maximum(top.inv_mass, 1e-30), 0.0)
    r = top.cluster_rest
    if x.shape[0] * k <= MXU_ONEHOT_MAX_ELEMS:
        hp = jax.lax.Precision.HIGHEST
        # cid == arange(K) never matches -1, so non-members drop out of
        # the plain one-hot too (used for the broadcast-backs)
        oh = (cid_raw[:, None] == jnp.arange(k, dtype=cid_raw.dtype)
              ).astype(x.dtype)
        w = m[:, None] * oh
        mass = jnp.sum(w, axis=0)
        cx = jnp.einsum("nk,nd->kd", w, x, precision=hp)
        c = cx / jnp.maximum(mass, 1e-30)[:, None]
        cb = jnp.einsum("nk,kd->nd", oh, c, precision=hp)     # c[cid]
        xc = x - cb
        A = jnp.einsum(
            "nk,nde->kde", w, xc[:, :, None] * r[:, None, :], precision=hp
        )
        quats = extract_rotations(A, quats, sm.iterations)
        qn = jnp.einsum("nk,kq->nq", oh, quats, precision=hp)  # quats[cid]
    else:
        cid = jnp.maximum(cid_raw, 0)
        mass = jax.ops.segment_sum(m, cid, num_segments=k)
        cx = jax.ops.segment_sum(m[:, None] * x, cid, num_segments=k)
        c = cx / jnp.maximum(mass, 1e-30)[:, None]
        cb = c[cid]
        xc = x - cb
        A = jax.ops.segment_sum(
            m[:, None, None] * xc[:, :, None] * r[:, None, :],
            cid, num_segments=k,
        )
        quats = extract_rotations(A, quats, sm.iterations)
        qn = quats[cid]
    # vectorized quat rotate of the rest offsets: v + 2 qv x (qv x v + qw v)
    qv, qw = qn[:, 1:], qn[:, 0:1]
    g = r + 2.0 * jnp.cross(qv, jnp.cross(qv, r) + qw * r) + cb
    dx = sm.stiffness * (g - x)
    return jnp.where(member[:, None], dx, 0.0), quats
