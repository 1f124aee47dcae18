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
   ``chunks`` 32-vertex SUBROWS of the partner tile, each predicated on
   the second-level bbox gate (solver/blocksparse.py::_chunk_masks):
   Morton subrows are spatially compact, so most subrows of a partner
   tile sit further than ``radius`` from tile i and their [32, BLOCK]
   pair slab is skipped entirely.  The mask is a bbox superset gate, so
   skipping never changes the force (same argument as the tile gate).

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

    def kernel(partners_ref, nvalid_ref, cmask_ref, x_ref, fo_ref, f_acc):
        # per-chunk diagonal masks (self-pair exclusion), hoisted: row r of
        # chunk c is sorted-global j = c*cs + r, excluded when j == i_lane
        cols = jax.lax.broadcasted_iota(jnp.int32, (cs, blk), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (cs, blk), 0)
        eye_c = [
            jnp.where(rows + c * cs == cols, 1e12, 0.0).astype(jnp.float32)
            for c in range(chunks)
        ]

        def tile_body(i, carry):
            xi = x_ref[i]                        # [3, BLOCK], i on lanes
            xi0 = xi[0][None, :]
            xi1 = xi[1][None, :]
            xi2 = xi[2][None, :]
            f_acc[...] = jnp.zeros((3, blk), jnp.float32)

            def k_body(k, c2):
                pk = partners_ref[i, k]
                xj = x_ref[pk]                   # [3, BLOCK]
                xj0 = xj[0][:, None]             # [BLOCK, 1], j on sublanes
                xj1 = xj[1][:, None]
                xj2 = xj[2][:, None]
                self_big = jnp.where(pk == i, 1.0, 0.0)
                for c in range(chunks):
                    @pl.when(cmask_ref[i, k * chunks + c] > 0.0)
                    def _(c=c):
                        sl = slice(c * cs, (c + 1) * cs)
                        dx0 = xi0 - xj0[sl]      # [cs, BLOCK]
                        dx1 = xi1 - xj1[sl]
                        dx2 = xi2 - xj2[sl]
                        d2 = (dx0 * dx0 + dx1 * dx1 + dx2 * dx2
                              + self_big * eye_c[c])
                        inv_d = jax.lax.rsqrt(jnp.maximum(d2, eps2))
                        w = jnp.where(
                            d2 < r2, stiffness * (radius * inv_d - 1.0), 0.0
                        )
                        f_acc[...] = f_acc[...] + jnp.stack([
                            jnp.sum(w * dx0, axis=0),
                            jnp.sum(w * dx1, axis=0),
                            jnp.sum(w * dx2, axis=0),
                        ])
                return c2

            # dynamic trip count: partners are sorted interacting-first, so
            # only the first nvalid[i] of the K budget do real work (the
            # mean is ~K/3 for cloth scenes — a ~2-3x saving)
            jax.lax.fori_loop(0, nvalid_ref[i], k_body, 0, unroll=1)
            fo_ref[i] = f_acc[...]
            return carry

        jax.lax.fori_loop(0, b, tile_body, 0, unroll=1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("radius", "stiffness", "k_budget", "interpret")
)
def _block_pairs_pallas(x_tiles, nvalid, partners, cmask, radius, stiffness,
                        k_budget, interpret=False):
    """x_tiles f32[B, 3, BLOCK] (padded tail at far coords), nvalid i32[B],
    partners i32[B, K], cmask f32[B, K*CHUNKS] -> forces f32[B, 3, BLOCK]
    (sorted-tile space)."""
    b, _, blk = x_tiles.shape
    kernel = _make_kernel(radius, stiffness, b, k_budget, blk, CHUNKS)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 3, blk), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # partners [B, K]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # nvalid   [B]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # cmask    [B, K*C]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # tiles    [B, 3, BLOCK]
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3, blk), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=b * k_budget * blk * blk * 25,
            bytes_accessed=2 * b * 3 * blk * 4,
            transcendentals=b * k_budget * blk * blk,
        ),
        interpret=interpret,
    )(partners, nvalid, cmask, x_tiles)


def self_collision_forces_block_pallas(
    x: jax.Array, p: SelfCollisionParams, interpret: bool = False
) -> jax.Array:
    """Pallas-tiled twin of blocksparse.self_collision_forces_block."""
    n = x.shape[0]
    xb, valid, order, b = _sorted_tiles(x, p.cell_size, p.block_size)
    k = min(p.block_partners, b)
    partners, pvalid, _ = _tile_partners(xb, valid, p.radius, k)
    cmask = _chunk_masks(xb, valid, partners, p.radius, CHUNKS)
    # gate dead slots out through the chunk mask too (slots past nvalid
    # never run; this keeps the mask meaningful if they ever did)
    cmask = cmask * pvalid[..., None]
    nvalid = jnp.sum(pvalid > 0.0, axis=1).astype(jnp.int32)   # [B]
    # padded tail at far coordinates (see module docstring)
    xb = jnp.where(valid[..., None], xb, 1e6)
    x_tiles = jnp.swapaxes(xb, 1, 2)                  # [B, 3, BLOCK]
    f_tiles = _block_pairs_pallas(
        x_tiles, nvalid, partners.astype(jnp.int32),
        cmask.reshape(b, -1).astype(jnp.float32),
        float(p.radius), float(p.stiffness), int(k), interpret,
    )
    f_sorted = jnp.swapaxes(f_tiles, 1, 2).reshape(-1, 3)[:n]
    return jnp.zeros_like(x).at[order].set(f_sorted)
