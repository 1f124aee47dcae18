"""Pallas kernel for block-sparse self-collision tile pairs.

The jnp twin (solver/blocksparse.py) materializes one [256, 256] weight
plane per (tile, partner) pair to HBM — ~800 MB of traffic per substep at
16k vertices (measured 1.4 ms).  Here the ENTIRE sorted tile array lives
in VMEM (16k verts = 200 KB, 64k = 800 KB — far under the 16 MB budget),
and ONE program walks the (tile, partner) pairs with dynamic VMEM
indexing: no HBM intermediates, no per-pair grid/DMA overhead (a
(B, K)-grid variant measured slower than the XLA twin from exactly that
overhead).

Work-skipping levels (both driven by SMEM scalars, so dead work costs a
scalar branch, not plane ops):

1. dynamic partner trip counts — partners are sorted interacting-first,
   so only the first ``nvalid[i]`` of the K budget run at all;
2. subrow gating — each surviving (tile, partner) pair unrolls over
   ``chunks`` 32-vertex SUBROWS of tile i, each predicated on the
   second-level bbox gate (solver/blocksparse.py::_chunk_masks): Morton
   subrows are spatially compact, so most subrows of tile i sit further
   than ``radius`` from a given partner and their [32, BLOCK] pair slab
   is skipped entirely.  The mask is a bbox superset gate, so skipping
   never changes the force (same argument as the tile gate).

Math notes vs the jnp twin (tested equal to 5e-4):
* distances are direct per-component VPU broadcasts — a [BLOCK,3]@[3,BLOCK]
  MXU Gram pads the 3-long contraction to 128 lanes (~40x wasted flops,
  measured slower), and the broadcast form has NO cancellation, so it
  needs neither ``Precision.HIGHEST`` nor bbox centering for conditioning
  (direct f32 differences of nearby points are exact to rounding; the
  twin's centered form agrees to f32 tolerance).
* padded tail vertices enter at FAR coordinates (+1e6) instead of
  carrying [BLOCK]-wide validity planes: d2 to any real vertex exceeds
  ``radius`` by construction, so they drop out of ``w`` for free; forces
  computed among the padded vertices themselves land on discarded output
  rows.  (64k/16k presets have no tail at all: 256 | N.)
* Mosaic only supports minor-dim inserts on 32-bit types: every
  [BLOCK] -> [BLOCK, 1] broadcast goes through f32, never bool.

The sorting/bbox/partner machinery stays in XLA (solver/blocksparse.py):
the sort is 79 us of the 1.5 ms total; the tile loop is the 1.4 ms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import SelfCollisionParams
from ..solver.blocksparse import _chunk_masks, _sorted_tiles, _tile_partners

# subrows per tile for the second-level gate: 256/8 = 32-vertex subrows.
# 8 keeps the scalar branch count at ~8 per surviving pair (negligible)
# while a 32-vertex Morton subrow is compact enough that folded piles
# keep only ~2-3 of 8 slabs alive.
CHUNKS = 8


def _make_kernel(radius: float, stiffness: float, b: int, k_budget: int,
                 blk: int, chunks: int):
    cs = blk // chunks
    eps2 = (1e-3 * radius) ** 2
    r2 = radius * radius

    def kernel(partners_ref, nvalid_ref, x_ref, fo_ref, f_acc):
        # pair planes are [i_subrow, j_lane]: the PARTNER side (per pair)
        # reads free [1, BLOCK] row slices of x_ref[pk]; only tile i (per
        # TILE) pays the lane->sublane relayouts.  The first orientation
        # ([j_sub, i_lane]) transposed the partner per PAIR — measured
        # ~1 us x 3 relayouts x sum(nvalid) pairs, the dominant kernel
        # cost at 64k.
        #
        # per-chunk diagonal masks (self-pair exclusion), hoisted: row r
        # of chunk c is sorted-global i = c*cs + r, excluded when == j
        cols = jax.lax.broadcasted_iota(jnp.int32, (cs, blk), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (cs, blk), 0)
        eye_c = [
            jnp.where(rows + c * cs == cols, 1e12, 0.0).astype(jnp.float32)
            for c in range(chunks)
        ]

        def tile_body(i, carry):
            xi = x_ref[i]                        # [3, BLOCK]
            xi0 = xi[0][:, None]                 # [BLOCK, 1], i on sublanes
            xi1 = xi[1][:, None]                 # (3 relayouts per TILE)
            xi2 = xi[2][:, None]
            f_acc[...] = jnp.zeros((blk, 8), jnp.float32)

            def k_body(k, c2):
                entry = partners_ref[i, k]
                pk = entry & 0xFFFF              # low 16: partner tile id
                xj = x_ref[pk]                   # [3, BLOCK]
                xj0 = xj[0][None, :]             # [1, BLOCK], free slices
                xj1 = xj[1][None, :]
                xj2 = xj[2][None, :]
                self_big = jnp.where(pk == i, 1.0, 0.0)
                for c in range(chunks):
                    @pl.when(((entry >> (16 + c)) & 1) > 0)
                    def _(c=c):
                        sl = slice(c * cs, (c + 1) * cs)
                        dx0 = xi0[sl] - xj0      # [cs, BLOCK]
                        dx1 = xi1[sl] - xj1
                        dx2 = xi2[sl] - xj2
                        d2 = (dx0 * dx0 + dx1 * dx1 + dx2 * dx2
                              + self_big * eye_c[c])
                        inv_d = jax.lax.rsqrt(jnp.maximum(d2, eps2))
                        w = jnp.where(
                            d2 < r2, stiffness * (radius * inv_d - 1.0), 0.0
                        )
                        # forces on tile i's rows: lane reductions land
                        # [cs, 1] columns, accumulated per component
                        f_acc[sl, 0:1] = f_acc[sl, 0:1] + jnp.sum(
                            w * dx0, axis=1, keepdims=True)
                        f_acc[sl, 1:2] = f_acc[sl, 1:2] + jnp.sum(
                            w * dx1, axis=1, keepdims=True)
                        f_acc[sl, 2:3] = f_acc[sl, 2:3] + jnp.sum(
                            w * dx2, axis=1, keepdims=True)
                return c2

            # dynamic trip count: partners are sorted interacting-first, so
            # only the first nvalid[i] of the K budget do real work (the
            # mean is ~K/3 for cloth scenes — a ~2-3x saving)
            jax.lax.fori_loop(0, nvalid_ref[i], k_body, 0, unroll=1)
            # back to the [3, BLOCK] row layout: ONE [BLOCK, 8] -> [8,
            # BLOCK] transpose per tile (jnp.stack of the lane columns
            # hits Mosaic "offset mismatch on non-concat dimension")
            fo_ref[i] = jnp.transpose(f_acc[...])[:3]
            return carry

        jax.lax.fori_loop(0, b, tile_body, 0, unroll=1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("radius", "stiffness", "k_budget", "interpret")
)
def _block_pairs_pallas(x_tiles, nvalid, partners, radius, stiffness,
                        k_budget, interpret=False):
    """x_tiles f32[B, 3, BLOCK] (padded tail at far coords), nvalid i32[B],
    partners i32[B, K] (low 16 bits: partner tile id; bits 16..16+CHUNKS:
    surviving-subrow mask — packed so a large exactness budget K keeps
    SMEM small) -> forces f32[B, 3, BLOCK] (sorted-tile space)."""
    b, _, blk = x_tiles.shape
    kernel = _make_kernel(radius, stiffness, b, k_budget, blk, CHUNKS)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 3, blk), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # partners [B, K]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # nvalid   [B]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # tiles    [B, 3, BLOCK]
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((blk, 8), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=b * k_budget * blk * blk * 25,
            bytes_accessed=2 * b * 3 * blk * 4,
            transcendentals=b * k_budget * blk * blk,
        ),
        interpret=interpret,
    )(partners, nvalid, x_tiles)


def self_collision_forces_block_pallas(
    x: jax.Array, p: SelfCollisionParams, interpret: bool = False
) -> jax.Array:
    """Pallas-tiled twin of blocksparse.self_collision_forces_block."""
    n = x.shape[0]
    xb, valid, order, b = _sorted_tiles(x, p.cell_size, p.block_size)
    if b >= 1 << 16:
        # partner tile ids are packed into the low 16 bits of the SMEM
        # entry (see _block_pairs_pallas); beyond 65535 tiles they would
        # silently alias into the chunk-mask bits — fail loudly instead
        raise NotImplementedError(
            f"block self-collision supports <{1 << 16} tiles, got {b} "
            f"(~{b * p.block_size:,} vertices); raise block_size or use "
            "method='hash'"
        )
    k = min(p.block_partners, b)
    partners, pvalid, _ = _tile_partners(xb, valid, p.radius, k)
    cmask = _chunk_masks(xb, valid, partners, p.radius, CHUNKS)
    nvalid = jnp.sum(pvalid > 0.0, axis=1).astype(jnp.int32)   # [B]
    bits = jnp.sum(cmask.astype(jnp.int32)
                   * (1 << jnp.arange(CHUNKS, dtype=jnp.int32)), axis=-1)
    packed = partners.astype(jnp.int32) | (bits << 16)
    # padded tail at far coordinates (see module docstring)
    xb = jnp.where(valid[..., None], xb, 1e6)
    x_tiles = jnp.swapaxes(xb, 1, 2)                  # [B, 3, BLOCK]
    f_tiles = _block_pairs_pallas(
        x_tiles, nvalid, packed,
        float(p.radius), float(p.stiffness), int(k), interpret,
    )
    f_sorted = jnp.swapaxes(f_tiles, 1, 2).reshape(-1, 3)[:n]
    return jnp.zeros_like(x).at[order].set(f_sorted)
