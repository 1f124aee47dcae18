"""Block-sparse self-collision for large single scenes — MXU tiles gated by
bounding boxes (the TPU-native answer to "spatial hash at 16k-64k verts").

The sort-based hash (solver/hashgrid.py) is exact but built from
searchsorted + per-row gathers — the op class that runs at ~1% of HBM
bandwidth on TPU (docs/PERF.md) — and the dense MXU rule is O(N^2).  This
path keeps the MXU formulation but makes it *block-sparse*:

1. sort vertices by Morton (Z-order) cell id once per step — near in space
   => near in the sorted order, so 256-vertex **tiles** of the sorted
   array are spatially compact;
2. per tile, an axis-aligned bounding box (masked min/max — no gathers);
3. tile pairs whose bbox gap exceeds ``radius`` PROVABLY contain no
   interacting pair and are skipped; each tile keeps its ``block_partners``
   nearest candidate tiles (budget overflow is *counted and reported*, see
   :func:`self_collision_block_diagnostics`);
4. each surviving (tile, partner) pair runs the exact dense MXU rule of
   ``self_collision_forces_dense_mxu`` on 256x256 sub-problems (Gram
   cancellation at ``Precision.HIGHEST`` — mandatory, see forces.py).

Exactness: the bbox test is a superset filter — with sufficient
``block_partners`` the produced pair set is IDENTICAL to the dense rule
(tests assert this), regardless of how stale the sort order is; sorting
affects only how many tile pairs survive, never correctness.  Cost is
O(N * partners * 256) instead of O(N^2): the only gathers are one N-row
position reorder and coarse 3 KB tile fetches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import SelfCollisionParams

BLOCK = 256           # default vertices per tile (SelfCollisionParams.
#                       block_size); pair work is LINEAR in the tile size
#                       when radius << tile span (each tile has ~9 geometric
#                       neighbours regardless), so 128 halves the VPU work —
#                       but never go below 128: the pair planes put tile
#                       vertices on the 128 VPU lanes, and a smaller minor
#                       dim idles lanes and pads every vreg
_MORTON_BITS = 10     # 1024^3 virtual grid


def _part1by2(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of v two apart (Morton interleave step)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def morton_ids(x: jax.Array, origin: jax.Array, cell_size: float) -> jax.Array:
    """Z-order curve id per vertex (30 bits, i32)."""
    c = jnp.floor((x - origin) / cell_size).astype(jnp.int32)
    c = jnp.clip(c, 0, (1 << _MORTON_BITS) - 1)
    return (
        _part1by2(c[:, 0])
        | (_part1by2(c[:, 1]) << 1)
        | (_part1by2(c[:, 2]) << 2)
    )


def _sorted_tiles(x: jax.Array, cell_size: float, blk: int = BLOCK):
    """Morton-sort and fold into [B, blk] tiles (zero-padded, masked)."""
    n = x.shape[0]
    b = -(-n // blk)
    npad = b * blk
    origin = jnp.min(x, axis=0) - 0.5 * cell_size
    order = jnp.argsort(morton_ids(x, origin, cell_size))
    xs = x[order]
    if npad != n:
        xs = jnp.pad(xs, ((0, npad - n), (0, 0)))
    valid = (jnp.arange(npad) < n).reshape(b, blk)
    xb = xs.reshape(b, blk, 3)
    return xb, valid, order, b


def _tile_partners(xb, valid, radius: float, k: int):
    """Per-tile partner tiles by bbox gap: ([B,K] ids, [B,K] valid, overflow).

    A tile pair is a candidate iff the per-axis bbox gap distance is
    <= radius (superset of the true interacting pair set).  ``overflow`` is
    the number of candidate pairs DROPPED by the K budget (0 => the result
    is exactly the dense pair set).
    """
    big = 1e18
    mn = jnp.min(jnp.where(valid[..., None], xb, big), axis=1)    # [B,3]
    mx = jnp.max(jnp.where(valid[..., None], xb, -big), axis=1)   # [B,3]
    gap = jnp.maximum(
        0.0,
        jnp.maximum(mn[:, None, :] - mx[None, :, :],
                    mn[None, :, :] - mx[:, None, :]),
    )                                                             # [B,B,3]
    d2 = jnp.sum(gap * gap, axis=-1)
    interact = d2 <= radius * radius                              # [B,B]
    # stable argsort of ~interact puts interacting tiles first, in
    # ascending tile order (deterministic)
    idx = jnp.argsort(~interact, axis=1, stable=True)[:, :k]      # [B,K]
    pvalid = jnp.take_along_axis(interact, idx, axis=1)           # [B,K]
    overflow = jnp.sum(interact) - jnp.sum(pvalid)
    return idx, pvalid, overflow


def _block_forces_sorted(xb, valid, partners, pvalid, radius: float,
                         stiffness: float, b: int, k: int):
    """Forces in sorted-tile space: f32[B, BLOCK, 3]."""
    # center each tile-pair product on tile i's bbox midpoint so the Gram
    # cancellation stays conditioned (same trick as dense_mxu, per-tile)
    big = 1e18
    mn = jnp.min(jnp.where(valid[..., None], xb, big), axis=1)
    mx = jnp.max(jnp.where(valid[..., None], xb, -big), axis=1)
    ctr = 0.5 * (mn + mx)                                         # [B,3]
    xci = xb - ctr[:, None, :]
    sqi = jnp.sum(xci * xci, axis=-1)                             # [B,BLOCK]
    iblk = jnp.arange(b)
    eye = jnp.eye(xb.shape[1], dtype=bool)
    f = jnp.zeros_like(xb)
    for kk in range(k):
        pk = partners[:, kk]                                      # [B]
        xj = xb[pk]                                               # [B,BLOCK,3] (3 KB tile fetch)
        vj = valid[pk]
        xcj = xj - ctr[:, None, :]
        sqj = jnp.sum(xcj * xcj, axis=-1)
        # Precision.HIGHEST is load-bearing (see forces.py dense_mxu)
        gram = jnp.einsum(
            "bid,bjd->bij", xci, xcj,
            precision=jax.lax.Precision.HIGHEST,
        )
        d2 = sqi[:, :, None] + sqj[:, None, :] - 2.0 * gram
        d = jnp.sqrt(jnp.maximum(d2, (1e-3 * radius) ** 2))
        same_tile = (pk == iblk)[:, None, None] & eye[None]
        active = (
            (d < radius)
            & valid[:, :, None] & vj[:, None, :]
            & ~same_tile
            & pvalid[:, kk, None, None]
        )
        w = jnp.where(active, stiffness * (radius - d) / d, 0.0)
        row = jnp.sum(w, axis=2)                                  # [B,BLOCK]
        wx = jnp.einsum(
            "bij,bjd->bid", w, xcj,
            precision=jax.lax.Precision.HIGHEST,
        )
        f = f + row[..., None] * xci - wx
    return f


def self_collision_forces_block(x: jax.Array, p: SelfCollisionParams) -> jax.Array:
    """Block-sparse vertex-vertex repulsion forces: f32[N,3].

    Oracle twin: reference.self_collision_forces (identical pair set when
    the partner budget suffices — check with
    :func:`self_collision_block_diagnostics`)."""
    n = x.shape[0]
    xb, valid, order, b = _sorted_tiles(x, p.cell_size, p.block_size)
    k = min(p.block_partners, b)
    partners, pvalid, _ = _tile_partners(xb, valid, p.radius, k)
    f_sorted = _block_forces_sorted(
        xb, valid, partners, pvalid, p.radius, p.stiffness, b, k
    ).reshape(-1, 3)[:n]
    return jnp.zeros_like(x).at[order].set(f_sorted)


def self_collision_block_diagnostics(x: jax.Array, p: SelfCollisionParams):
    """{'candidate_pairs', 'dropped_pairs'} — dropped_pairs == 0 proves the
    force is exactly the dense rule for this configuration."""
    xb, valid, _, b = _sorted_tiles(x, p.cell_size, p.block_size)
    k = min(p.block_partners, b)
    _, pvalid, overflow = _tile_partners(xb, valid, p.radius, k)
    return {
        "candidate_pairs": jnp.sum(pvalid) + overflow,
        "dropped_pairs": overflow,
    }
