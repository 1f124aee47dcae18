"""Row-tiled Pallas Euler substep for grids beyond VMEM capacity.

The whole-in-VMEM kernel (pallas_substep.py) caps at ~128k vertices.  This
kernel tiles the grid by rows: each program DMAs its ``(TILE+4, nx)``
window of x/v from HBM into VMEM scratch (2-row halos = the bend-spring
reach), runs ONE fused substep, and writes its ``(TILE, nx)`` interior.
Multi-substep VMEM residency is impossible across tiles (TPU grid programs
run sequentially, so halos can't be refreshed between substeps inside one
launch); the win over the XLA stencil path is fusing the ~20 per-substep
HBM round-trips into exactly one read + one write of state.

Correctness mirrors parallel/halo.py: all spring offsets point down/right,
so 2-row halos above and below suffice; edge validity at global boundaries
is judged by global-row iota masks, and halo scratch rows are zeroed first
so missing halos can never inject non-finite garbage (0 * Inf = NaN).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import SimConfig
from ..core.state import State
from ..core.topology import EDGE_BEND, EDGE_SHEAR, Topology
from .pallas_substep import _kroll
from .stencil import _offsets

HALO = 2       # physical spring reach (bend = 2 rows)
HPAD = 8       # DMA'd halo rows: Mosaic requires 8-aligned sublane offsets,
               # so we transfer 8 neighbour rows instead of 2; the global-row
               # masks make the extra rows inert and the interior sits at an
               # aligned offset


def _global_edge_mask(ext: int, nx: int, ny: int, row0, di: int, dj: int):
    """Ownership mask for the extended window; rows judged globally."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (ext, nx), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (ext, nx), 1)
    ok = (
        (rows >= 0) & (rows < ny) & (rows + di >= 0) & (rows + di < ny)
        & (cols + dj >= 0) & (cols + dj < nx)
    )
    return ok.astype(jnp.float32)


def _make_kernel(cfg: SimConfig, offsets, ny: int, nx: int, tile: int, dt: float):
    g = cfg.gravity
    damping = cfg.springs.damping
    gdamp = cfg.global_damping
    restitution = cfg.collision.restitution
    friction = cfg.collision.friction
    plane_on = cfg.collision.enable_plane
    ext = tile + 2 * HPAD

    def kernel(plane_ref, x_hbm, v_hbm, im_ref, xo_ref, vo_ref, xs, vs, sem):
        i = pl.program_id(0)
        n_tiles = pl.num_programs(0)
        row0 = i * tile - HPAD  # global row of extended-window row 0
        # alignment hints: Mosaic must prove sublane DMA offsets are
        # 8-divisible (tile % 8 == 0 guarantees it; the compiler can't infer)
        tile0 = pl.multiple_of(i * tile, HPAD)
        tile_up = pl.multiple_of(i * tile - HPAD, HPAD)
        tile_dn = pl.multiple_of((i + 1) * tile, HPAD)
        plane_y = plane_ref[0, 0]

        # halo rows zeroed first: a missing neighbour must read as 0.0, not
        # uninitialized VMEM (masks multiply by 0, and 0 * NaN would poison)
        xs[:, 0:HPAD, :] = jnp.zeros((3, HPAD, nx), jnp.float32)
        vs[:, 0:HPAD, :] = jnp.zeros((3, HPAD, nx), jnp.float32)
        xs[:, tile + HPAD :, :] = jnp.zeros((3, HPAD, nx), jnp.float32)
        vs[:, tile + HPAD :, :] = jnp.zeros((3, HPAD, nx), jnp.float32)

        cp_xi = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(tile0, tile), :],
            xs.at[:, pl.ds(HPAD, tile), :], sem.at[0],
        )
        cp_vi = pltpu.make_async_copy(
            v_hbm.at[:, pl.ds(tile0, tile), :],
            vs.at[:, pl.ds(HPAD, tile), :], sem.at[1],
        )
        cp_xi.start()
        cp_vi.start()

        @pl.when(i > 0)
        def _():
            up_x = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(tile_up, HPAD), :],
                xs.at[:, pl.ds(0, HPAD), :], sem.at[2],
            )
            up_v = pltpu.make_async_copy(
                v_hbm.at[:, pl.ds(tile_up, HPAD), :],
                vs.at[:, pl.ds(0, HPAD), :], sem.at[3],
            )
            up_x.start()
            up_v.start()
            up_x.wait()
            up_v.wait()

        @pl.when(i < n_tiles - 1)
        def _():
            dn_x = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(tile_dn, HPAD), :],
                xs.at[:, pl.ds(tile + HPAD, HPAD), :], sem.at[4],
            )
            dn_v = pltpu.make_async_copy(
                v_hbm.at[:, pl.ds(tile_dn, HPAD), :],
                vs.at[:, pl.ds(tile + HPAD, HPAD), :], sem.at[5],
            )
            dn_x.start()
            dn_v.start()
            dn_x.wait()
            dn_v.wait()

        cp_xi.wait()
        cp_vi.wait()

        xw = xs[:]                           # [3, ext, nx] stacked
        vw = vs[:]

        # spring forces on the extended window (reactions from upper-halo
        # owners land in the interior via the reverse roll; see halo.py);
        # stacked 3D rolls: one roll moves all three component planes
        f = jnp.zeros((3, ext, nx), jnp.float32)
        for di, dj, k, rest in offsets:
            mask = _global_edge_mask(ext, nx, ny, row0, di, dj)
            xn = _kroll(xw, di, dj)
            vn = _kroll(vw, di, dj)
            d = xn - xw
            d2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            inv_len = jax.lax.rsqrt(jnp.maximum(d2, 1e-24))
            length = d2 * inv_len
            n = d * inv_len[None]
            dv = vn - vw
            rel_v = dv[0] * n[0] + dv[1] * n[1] + dv[2] * n[2]
            fmag = (k * (length - rest) + damping * rel_v) * mask
            fo = fmag[None] * n
            f = f + fo - _kroll(fo, -di, -dj)

        im = im_ref[:]                       # [tile, nx] interior inv-mass
        movable = im > 0.0
        sl = lambda a: a[HPAD : HPAD + tile, :]
        vz = []
        for c, gc in enumerate(g):
            vc = (sl(vw[c]) + dt * (gc + sl(f[c]) * im)) * (1.0 - gdamp * dt)
            vz.append(jnp.where(movable, vc, 0.0))
        xz = [sl(xw[c]) + dt * vz[c] for c in range(3)]
        if plane_on:
            contact = (xz[1] < plane_y) & movable
            xz[1] = jnp.where(contact, plane_y, xz[1])
            vy = vz[1]
            vz[1] = jnp.where(
                contact, jnp.where(vy < 0.0, -restitution * vy, vy), vy
            )
            fr = 1.0 - friction
            vz[0] = jnp.where(contact, vz[0] * fr, vz[0])
            vz[2] = jnp.where(contact, vz[2] * fr, vz[2])
        for c in range(3):
            xo_ref[c] = xz[c]
            vo_ref[c] = vz[c]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cfg", "offsets", "tile", "dt", "n_substeps", "interpret")
)
def _tiled_substeps(x3, v3, inv_mass2d, plane_h, cfg, offsets, tile, dt,
                    n_substeps, interpret=False):
    ny, nx = x3.shape[-2], x3.shape[-1]
    n_tiles = ny // tile
    kernel = _make_kernel(cfg, offsets, ny, nx, tile, dt)

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=(
            jax.ShapeDtypeStruct((3, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((3, ny, nx), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # plane height (1,1)
            pl.BlockSpec(memory_space=pltpu.ANY),       # x in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),       # v in HBM
            pl.BlockSpec((tile, nx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # inv-mass interior
        ],
        out_specs=(
            pl.BlockSpec((3, tile, nx), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile, nx), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, tile + 2 * HPAD, nx), jnp.float32),
            pltpu.VMEM((3, tile + 2 * HPAD, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
    )

    def one(x3, v3):
        return call(plane_h.reshape(1, 1), x3, v3, inv_mass2d)

    def body(carry, _):
        x3, v3 = carry
        return one(x3, v3), None

    (xo, vo), _ = jax.lax.scan(body, (x3, v3), None, length=n_substeps)
    return xo, vo


def make_tiled_step(top: Topology, cfg: SimConfig, tile: int = 0,
                    interpret: bool = False):
    """Build ``fn(state, dt, n_substeps)`` for grids too large for the
    whole-VMEM kernel.  Requires ``ny % tile == 0``; plane collider only.
    ``tile=0`` auto-sizes so the working set (~20 live planes of
    ``(tile+16, nx)``) stays inside the 16 MB VMEM scope."""
    ny, nx = top.grid_shape
    if tile == 0:
        tile = max(HPAD, ((64 * 1024) // nx) // HPAD * HPAD)
        while ny % tile != 0 and tile > HPAD:
            tile -= HPAD
    if ny % tile != 0:
        raise ValueError(f"ny={ny} must be a multiple of tile={tile}")
    if tile % HPAD != 0 or tile < HPAD:
        raise ValueError(f"tile={tile} must be a multiple of {HPAD}")
    if cfg.collision.enable_spheres and top.n_spheres > 0:
        raise ValueError("tiled kernel supports the plane collider only")
    has_shear = EDGE_SHEAR in top.edge_classes_present
    has_bend = EDGE_BEND in top.edge_classes_present
    offsets = tuple(_offsets(cfg, top.grid_spacing, has_shear, has_bend))

    def fn(state: State, dt: float, n_substeps: int) -> State:
        x3 = state.x.T.reshape(3, ny, nx)
        v3 = state.v.T.reshape(3, ny, nx)
        im = top.inv_mass.reshape(ny, nx)
        xo, vo = _tiled_substeps(
            x3, v3, im, top.plane_height, cfg, offsets, int(tile),
            float(dt), int(n_substeps), interpret,
        )
        x = xo.reshape(3, -1).T
        v = vo.reshape(3, -1).T
        return State(x=x, v=v, x_prev=x - dt * v)

    return fn
