"""Pallas kernel for block-sparse self-collision tile pairs.

The jnp twin (solver/blocksparse.py) materializes one [256, 256] weight
plane per (tile, partner) pair to HBM — ~800 MB of traffic per substep at
16k vertices (measured 1.4 ms).  Here the ENTIRE sorted tile array lives
in VMEM (16k verts = 200 KB, 64k = 800 KB — far under the 16 MB budget),
and ONE program walks the (tile, partner) pairs with dynamic VMEM
indexing: no HBM intermediates, no per-pair grid/DMA overhead (a
(B, K)-grid variant measured slower than the XLA twin from exactly that
overhead).

Work skipping is the dynamic partner trip count alone: partners are
sorted interacting-first, so only the first ``nvalid[i]`` of the K
budget run at all (mean ~K/5 for cloth scenes).  A second-level subrow
gate (bbox-masked 32-row chunks of tile i, round-4 WIP) was measured
round 5 and REMOVED: a ``pl.when`` scalar branch costs ~30 ns while the
32-row slab it can skip costs ~49 ns, so at the 0.5-0.6 chunk survival
of real drapes every gated variant lost to the branch-free kernel
(chunks 8/4/2/1 = 2.77/2.33/2.01/1.82 ms end-to-end on the draped 64k
curtain; exactness was never at stake — the gate was a superset filter).

Per-pair cost structure (round-5 measurement, draped 64k, 4.9k pairs):
the per-slab ``jnp.sum`` lane reductions were 58% of the whole kernel.
``w * dx`` is therefore accumulated ELEMENTWISE into three [BLOCK, BLOCK]
VMEM accumulator planes and lane-reduced ONCE per tile — numerically the
same f32 sum of the same products, different association — which took
the kernel from 3.6 ms to 1.8 ms standalone (base -> dx3 variants).

Math notes vs the jnp twin (tested equal to 5e-4):
* distances are direct per-component VPU broadcasts — a [BLOCK,3]@[3,BLOCK]
  MXU Gram pads the 3-long contraction to 128 lanes (~40x wasted flops,
  measured slower), and the broadcast form has NO cancellation, so it
  needs neither ``Precision.HIGHEST`` nor bbox centering for conditioning
  (direct f32 differences of nearby points are exact to rounding; the
  twin's centered form agrees to f32 tolerance).
* ``w = max(stiffness*radius * inv_d - stiffness, 0)`` replaces the
  compare+select form (equal for d > 0: positive iff d < radius; the eps
  clamp and the far-padded-tail both land at w = 0 identically) — two
  fewer vector ops per slab.
* pair planes are [i_subrow, j_lane]: the PARTNER side (per pair) reads
  free [1, BLOCK] row slices of x_ref[pk]; only tile i (per TILE) pays
  the lane->sublane relayouts.  The first orientation ([j_sub, i_lane])
  transposed the partner per PAIR — measured ~1 us x 3 relayouts x
  sum(nvalid) pairs, the dominant kernel cost at 64k.
* padded tail vertices enter at FAR coordinates (+1e6) instead of
  carrying [BLOCK]-wide validity planes: d2 to any real vertex exceeds
  ``radius`` by construction, so they drop out of ``w`` for free; forces
  computed among the padded vertices themselves land on discarded output
  rows.  (64k/16k presets have no tail at all: 256 | N.)
* Mosaic only supports minor-dim inserts on 32-bit types: every
  [BLOCK] -> [BLOCK, 1] broadcast goes through f32, never bool.

The sorting/bbox/partner machinery stays in XLA (solver/blocksparse.py);
the unsort back to vertex order is an inverse-permutation GATHER
(``f[argsort(order)]``) — the ``.at[order].set`` scatter form measured
240 us/substep slower at 64k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import SelfCollisionParams
from ..solver.blocksparse import _sorted_tiles, _tile_partners


def _make_kernel(radius: float, stiffness: float, b: int, k_budget: int,
                 blk: int, dual: bool = False):
    """``dual=False``: i-tiles and partner tiles come from the SAME tile
    array (the single-device path).  ``dual=True``: partner tiles come
    from a SECOND tile array (the halo form — local rows vs the
    all-gathered cloth, parallel/halo.py).

    No self-pair diagonal mask in either mode: the contribution of a
    bit-coincident pair is ``w * dx`` with finite w (the eps2 clamp
    bounds inv_d) and dx exactly 0.0, i.e. exactly zero — the oracle's
    own ``w(d) * (xi - xj)`` form gives the identical zero, so masking
    the diagonal (or the same vertex meeting itself through the gathered
    copy) is unnecessary, and the two scalar branches it cost per pair
    are gone."""
    eps2 = (1e-3 * radius) ** 2
    c1 = stiffness * radius
    c2f = stiffness

    def kernel(partners_ref, nvalid_ref, x_ref, *rest):
        if dual:
            xj_ref, fo_ref, f_acc, a0_ref, a1_ref, a2_ref = rest
        else:
            fo_ref, f_acc, a0_ref, a1_ref, a2_ref = rest
            xj_ref = x_ref

        def tile_body(i, carry):
            xi = x_ref[i]                        # [3, BLOCK]
            xi0 = xi[0][:, None]                 # [BLOCK, 1], i on sublanes
            xi1 = xi[1][:, None]                 # (3 relayouts per TILE)
            xi2 = xi[2][:, None]
            a0_ref[...] = jnp.zeros((blk, blk), jnp.float32)
            a1_ref[...] = jnp.zeros((blk, blk), jnp.float32)
            a2_ref[...] = jnp.zeros((blk, blk), jnp.float32)

            def k_body(k, c2):
                pk = partners_ref[i, k]
                xj = xj_ref[pk]                  # [3, BLOCK]
                xj0 = xj[0][None, :]             # [1, BLOCK], free slices
                xj1 = xj[1][None, :]
                xj2 = xj[2][None, :]
                dx0 = xi0 - xj0                  # [BLOCK, BLOCK]
                dx1 = xi1 - xj1
                dx2 = xi2 - xj2
                d2 = dx0 * dx0 + dx1 * dx1 + dx2 * dx2
                inv_d = jax.lax.rsqrt(jnp.maximum(d2, eps2))
                w = jnp.maximum(c1 * inv_d - c2f, 0.0)
                a0_ref[...] = a0_ref[...] + w * dx0
                a1_ref[...] = a1_ref[...] + w * dx1
                a2_ref[...] = a2_ref[...] + w * dx2
                return c2

            # dynamic trip count: partners are sorted interacting-first, so
            # only the first nvalid[i] of the K budget do real work
            jax.lax.fori_loop(0, nvalid_ref[i], k_body, 0, unroll=1)
            f_acc[...] = jnp.zeros((blk, 8), jnp.float32)
            f_acc[:, 0:1] = jnp.sum(a0_ref[...], axis=1, keepdims=True)
            f_acc[:, 1:2] = jnp.sum(a1_ref[...], axis=1, keepdims=True)
            f_acc[:, 2:3] = jnp.sum(a2_ref[...], axis=1, keepdims=True)
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
    partners i32[B, K] (plain tile ids, interacting-first)
    -> forces f32[B, 3, BLOCK] (sorted-tile space)."""
    b, _, blk = x_tiles.shape
    kernel = _make_kernel(radius, stiffness, b, k_budget, blk)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 3, blk), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # partners [B, K]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # nvalid   [B]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # tiles    [B, 3, BLOCK]
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((blk, 8), jnp.float32)]
        + [pltpu.VMEM((blk, blk), jnp.float32)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=b * k_budget * blk * blk * 25,
            bytes_accessed=2 * b * 3 * blk * 4,
            transcendentals=b * k_budget * blk * blk,
        ),
        interpret=interpret,
    )(partners, nvalid, x_tiles)


@functools.partial(
    jax.jit, static_argnames=("radius", "stiffness", "k_budget", "interpret")
)
def _block_pairs_dual_pallas(xi_tiles, xj_tiles, nvalid, partners, radius,
                             stiffness, k_budget, interpret=False):
    """Dual-array form: forces on ``xi_tiles`` f32[Bi, 3, BLOCK] from
    partner tiles in ``xj_tiles`` f32[Bj, 3, BLOCK] (the halo path)."""
    b_i, _, blk = xi_tiles.shape
    kernel = _make_kernel(radius, stiffness, b_i, k_budget, blk, dual=True)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_i, 3, blk), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # partners [Bi, K]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # nvalid   [Bi]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # i tiles  [Bi,3,BLOCK]
            pl.BlockSpec(memory_space=pltpu.VMEM),    # j tiles  [Bj,3,BLOCK]
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((blk, 8), jnp.float32)]
        + [pltpu.VMEM((blk, blk), jnp.float32)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=b_i * k_budget * blk * blk * 25,
            bytes_accessed=2 * b_i * 3 * blk * 4,
            transcendentals=b_i * k_budget * blk * blk,
        ),
        interpret=interpret,
    )(partners, nvalid, xi_tiles, xj_tiles)


def self_collision_forces_block_dual_pallas(
    xi: jax.Array, xall: jax.Array, p: SelfCollisionParams,
    interpret: bool = False
) -> jax.Array:
    """Pallas twin of blocksparse.self_collision_forces_block_dual:
    forces ON ``xi`` f32[ni, 3] (a subset of ``xall`` f32[N, 3]) from the
    exact global pair set — the per-device body of the row-sharded halo
    self-collision (parallel/halo.py)."""
    from ..solver.blocksparse import (
        self_collision_forces_block_dual as _dual_jnp)  # noqa: F401 (doc ref)

    ni = xi.shape[0]
    xb_i, valid_i, order_i, b_i = _sorted_tiles(xi, p.cell_size,
                                                p.block_size)
    xb_g, valid_g, _, b_g = _sorted_tiles(xall, p.cell_size, p.block_size)
    k = min(p.block_partners, b_g)
    partners, pvalid, _ = _tile_partners(
        xb_i, valid_i, p.radius, k, xb_j=xb_g, valid_j=valid_g)
    nvalid = jnp.sum(pvalid > 0.0, axis=1).astype(jnp.int32)
    # opposite far signs so pad-vs-pad pairs across the two tilings are
    # 2e6 apart (never coincident; real-vs-pad exceeds radius either way)
    xb_i = jnp.where(valid_i[..., None], xb_i, -1e6)
    xb_g = jnp.where(valid_g[..., None], xb_g, 1e6)
    f_tiles = _block_pairs_dual_pallas(
        jnp.swapaxes(xb_i, 1, 2), jnp.swapaxes(xb_g, 1, 2),
        nvalid, partners.astype(jnp.int32),
        float(p.radius), float(p.stiffness), int(k), interpret,
    )
    f_sorted = jnp.swapaxes(f_tiles, 1, 2).reshape(-1, 3)[:ni]
    return f_sorted[jnp.argsort(order_i)]


def self_collision_forces_block_pallas(
    x: jax.Array, p: SelfCollisionParams, interpret: bool = False
) -> jax.Array:
    """Pallas-tiled twin of blocksparse.self_collision_forces_block."""
    n = x.shape[0]
    xb, valid, order, b = _sorted_tiles(x, p.cell_size, p.block_size)
    k = min(p.block_partners, b)
    partners, pvalid, _ = _tile_partners(xb, valid, p.radius, k)
    nvalid = jnp.sum(pvalid > 0.0, axis=1).astype(jnp.int32)   # [B]
    # padded tail at far coordinates (see module docstring)
    xb = jnp.where(valid[..., None], xb, 1e6)
    x_tiles = jnp.swapaxes(xb, 1, 2)                  # [B, 3, BLOCK]
    f_tiles = _block_pairs_pallas(
        x_tiles, nvalid, partners.astype(jnp.int32),
        float(p.radius), float(p.stiffness), int(k), interpret,
    )
    f_sorted = jnp.swapaxes(f_tiles, 1, 2).reshape(-1, 3)[:n]
    # unsort via the INVERSE-permutation gather: .at[order].set scatter
    # measured 240 us/substep slower than argsort(order)+gather at 64k
    # (TPU scatters pay a sorted-unique check gathers don't)
    return f_sorted[jnp.argsort(order)]
