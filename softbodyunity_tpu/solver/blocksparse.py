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


def _tile_partners(xb, valid, radius: float, k: int, xb_j=None,
                   valid_j=None):
    """Per-tile partner tiles by bbox gap: ([B,K] ids, [B,K] valid, overflow).

    A tile pair is a candidate iff the per-axis bbox gap distance is
    <= radius (superset of the true interacting pair set).  ``overflow`` is
    the number of candidate pairs DROPPED by the K budget (0 => the result
    is exactly the dense pair set).

    With ``xb_j``/``valid_j`` the search is RECTANGULAR: i-tiles from
    ``xb``, candidate partners from the second tile array (the halo dual
    form — local rows vs the all-gathered cloth, parallel/halo.py).
    """
    big = 1e18
    mn = jnp.min(jnp.where(valid[..., None], xb, big), axis=1)    # [B,3]
    mx = jnp.max(jnp.where(valid[..., None], xb, -big), axis=1)   # [B,3]
    if xb_j is None:
        mn_j, mx_j = mn, mx
    else:
        mn_j = jnp.min(jnp.where(valid_j[..., None], xb_j, big), axis=1)
        mx_j = jnp.max(jnp.where(valid_j[..., None], xb_j, -big), axis=1)
    gap = jnp.maximum(
        0.0,
        jnp.maximum(mn[:, None, :] - mx_j[None, :, :],
                    mn_j[None, :, :] - mx[:, None, :]),
    )                                                             # [B,Bj,3]
    d2 = jnp.sum(gap * gap, axis=-1)
    interact = d2 <= radius * radius                              # [B,Bj]
    # stable argsort of ~interact puts interacting tiles first, in
    # ascending tile order (deterministic)
    idx = jnp.argsort(~interact, axis=1, stable=True)[:, :k]      # [B,K]
    pvalid = jnp.take_along_axis(interact, idx, axis=1)           # [B,K]
    overflow = jnp.sum(interact) - jnp.sum(pvalid)
    return idx, pvalid, overflow


def self_collision_forces_block(x: jax.Array, p: SelfCollisionParams) -> jax.Array:
    """Block-sparse vertex-vertex repulsion forces: f32[N,3].

    Oracle twin: reference.self_collision_forces (identical pair set when
    the partner budget suffices — check with
    :func:`self_collision_block_diagnostics`).  Thin wrapper over the
    dual form with both sides the same array: the earlier per-tile-pair
    GRAM formulation (centered, Precision.HIGHEST) lost ALL precision
    for near-coincident pairs — at the eps-clamp scale d ~ 1e-3*radius,
    the Gram cancellation's f32 error matches d^2 itself, and a crushed
    pile measured 6% force error against the oracle rule while the
    direct per-component form held 3e-6 (round 5).  The direct form
    needs no precision escape hatch and matches the Pallas kernel's
    math exactly; this path is the CPU/testing fallback, so its extra
    HBM traffic vs Gram is irrelevant."""
    return self_collision_forces_block_dual(x, x, p)


def self_collision_forces_block_dual(
    xi: jax.Array, xall: jax.Array, p: SelfCollisionParams
) -> jax.Array:
    """Repulsion forces ON ``xi`` f32[ni, 3] from ALL of ``xall`` f32[N, 3]
    (``xi`` must be a subset of ``xall``) — the row-sharded halo form
    (parallel/halo.py): each device owns ``xi`` = its rows and all-gathers
    ``xall``, so the force work shards by rows while the pair set stays
    the EXACT global one.

    Self/coincident pairs need no exclusion in this form: the oracle's
    contribution is ``w(d) * (xi - xj)``, which is exactly 0 when the two
    positions are bit-equal (w is finite by the eps clamp), so a vertex
    meeting itself in ``xall`` adds zero — same argument as the kernel
    twin (kernels/pallas_blocks.py).  Direct dx form throughout: no Gram
    cancellation, so no HIGHEST/centering requirements."""
    ni = xi.shape[0]
    xb_i, valid_i, order_i, b_i = _sorted_tiles(xi, p.cell_size,
                                                p.block_size)
    xb_g, valid_g, _, b_g = _sorted_tiles(xall, p.cell_size, p.block_size)
    k = min(p.block_partners, b_g)
    partners, pvalid, _ = _tile_partners(
        xb_i, valid_i, p.radius, k, xb_j=xb_g, valid_j=valid_g)
    eps = 1e-3 * p.radius
    xg = jnp.where(valid_g[..., None], xb_g, 1e6)
    xiv = jnp.where(valid_i[..., None], xb_i, -1e6)   # opposite far sign:
    # pad-vs-pad pairs across the two tilings sit 2e6 apart, never 0/0
    f = jnp.zeros_like(xb_i)
    for kk in range(k):
        pk = partners[:, kk]                           # [Bi]
        xj = xg[pk]                                    # [Bi, blk, 3]
        diff = xiv[:, :, None, :] - xj[:, None, :, :]  # [Bi, blk, blk, 3]
        d2 = jnp.sum(diff * diff, axis=-1)
        d = jnp.sqrt(jnp.maximum(d2, eps * eps))
        w = jnp.where(
            (d < p.radius) & pvalid[:, kk, None, None],
            p.stiffness * (p.radius - d) / d, 0.0,
        )
        f = f + jnp.sum(w[..., None] * diff, axis=2)
    f_sorted = f.reshape(-1, 3)[:ni]
    return f_sorted[jnp.argsort(order_i)]


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
