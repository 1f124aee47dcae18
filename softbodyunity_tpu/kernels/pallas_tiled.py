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
from .pallas_substep import (
    _kroll,
    _pack_boxes,
    _pack_capsules,
    _pack_plane,
    _pack_spheres,
    _project_capsules_boxes_smem,
    _project_spheres_positions,
    _resolve_capsules_boxes_smem,
    _resolve_spheres_velocity,
)
from .stencil import _offsets, _xpbd_offsets, wind_forces_grid

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


def _feature_plane_maps(top: Topology, cfg: SimConfig, offsets,
                        ny: int, nx: int):
    """Build ``(to_planes, finish)`` for the stacked per-offset feature
    planes the tiled kernels carry (tear liveness planes first, plastic
    rest-scale planes after; same flat-edge -> plane scatter for both).

    ``to_planes(state)`` stacks the enabled features into one
    ``[n_feat, ny, nx]`` array; ``finish(xo, fo, state)`` applies the
    oracle's end-of-frame updates (plastic flow first, then the tear
    check against the rescaled rest — the update the next frame's first
    launch would otherwise compute and skip) and returns
    ``(edge_alive, rest_scale)``."""
    from .stencil import plastic_update_grid, tear_plane_maps, tear_update_grid

    tearing = cfg.tear.enabled
    plastic = cfg.plasticity.enabled
    edge_to_planes, planes_to_edge = tear_plane_maps(top, offsets, ny, nx)
    n_off = len(offsets)

    def to_planes(state: State):
        planes = []
        if tearing:
            planes.append(edge_to_planes(state.edge_alive))
        if plastic:
            planes.append(edge_to_planes(state.rest_scale))
        return jnp.concatenate(planes, axis=0)

    def finish(xo, fo, state: State):
        alive, scale = state.edge_alive, state.rest_scale
        so = None
        if plastic:
            so = plastic_update_grid(xo, offsets, fo[n_off * int(tearing):],
                                     cfg.plasticity)
            scale = planes_to_edge(so)
        if tearing:
            ao = tear_update_grid(xo, offsets, fo[:n_off],
                                  cfg.tear.strain_limit, rest_scale=so)
            alive = planes_to_edge(ao)
        return alive, scale

    return to_planes, finish


def _make_kernel(cfg: SimConfig, offsets, ny: int, nx: int, tile: int,
                 dt: float, n_spheres: int,
                 n_capsules: int = 0, n_boxes: int = 0):
    g = cfg.gravity
    damping = cfg.springs.damping
    gdamp = cfg.global_damping
    restitution = cfg.collision.restitution
    friction = cfg.collision.friction
    plane_on = cfg.collision.enable_plane
    spheres_on = cfg.collision.enable_spheres and n_spheres > 0
    n_caps_on = n_capsules if cfg.collision.enable_capsules else 0
    n_boxes_on = n_boxes if cfg.collision.enable_boxes else 0
    ext = tile + 2 * HPAD
    wind_on = cfg.wind.enabled
    tearing = cfg.tear.enabled
    plastic = cfg.plasticity.enabled
    feat = tearing or plastic
    n_off = len(offsets)
    # per-offset feature planes travel as ONE stacked array: tear liveness
    # planes first, plastic rest-scale planes after
    n_feat = n_off * (int(tearing) + int(plastic))

    def kernel(*refs):
        # inputs: plane, spheres, capsules, boxes, [first-flag], x, v, im,
        # [feat]; outputs: xo, vo, [fo]; scratch: xs, vs, [as_], sem
        if feat:
            (plane_ref, sph_ref, cap_ref, box_ref, first_ref, x_hbm, v_hbm,
             im_ref, a_hbm, xo_ref, vo_ref, ao_ref, xs, vs, as_, sem) = refs
        else:
            (plane_ref, sph_ref, cap_ref, box_ref, x_hbm, v_hbm, im_ref,
             xo_ref, vo_ref, xs, vs, sem) = refs
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
        if feat:
            as_[:, 0:HPAD, :] = jnp.zeros((n_feat, HPAD, nx), jnp.float32)
            as_[:, tile + HPAD :, :] = jnp.zeros((n_feat, HPAD, nx),
                                                 jnp.float32)

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
        if feat:
            cp_ai = pltpu.make_async_copy(
                a_hbm.at[:, pl.ds(tile0, tile), :],
                as_.at[:, pl.ds(HPAD, tile), :], sem.at[6],
            )
            cp_ai.start()

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
            if feat:
                up_a = pltpu.make_async_copy(
                    a_hbm.at[:, pl.ds(tile_up, HPAD), :],
                    as_.at[:, pl.ds(0, HPAD), :], sem.at[7],
                )
                up_a.start()
                up_a.wait()
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
            if feat:
                dn_a = pltpu.make_async_copy(
                    a_hbm.at[:, pl.ds(tile_dn, HPAD), :],
                    as_.at[:, pl.ds(tile + HPAD, HPAD), :], sem.at[8],
                )
                dn_a.start()
                dn_a.wait()
            dn_x.wait()
            dn_v.wait()

        cp_xi.wait()
        cp_vi.wait()
        if feat:
            cp_ai.wait()

        xw = xs[:]                           # [3, ext, nx] stacked
        vw = vs[:]
        sw = None
        if feat:
            # feature-update-at-start (skipped on the frame's first
            # launch): the previous launch's post-substep x is THIS
            # launch's input, so updating here reproduces the oracle's
            # end-of-substep plastic flow + tear check exactly (flow
            # first, then the tear check against the rescaled rest); the
            # frame wrapper applies the final end-of-frame updates.
            # Wrap-roll garbage sits in the bottom 2 window rows, whose
            # planes are only read by down-halo owners that never reach
            # the interior slice.
            from .pallas_substep import _plastic_planes_kroll
            from .stencil import tear_ok_planes

            first = first_ref[0, 0]
            if plastic:
                sw = [as_[n_off * int(tearing) + o] for o in range(n_off)]
                new_sw = _plastic_planes_kroll(xw, offsets, sw,
                                               cfg.plasticity)
                sw = [jnp.where(first > 0.5, sw[o], new_sw[o])
                      for o in range(n_off)]
            if tearing:
                ok = tear_ok_planes(xw, offsets, cfg.tear.strain_limit,
                                    shift=_kroll, rest_scale=sw)
                aw = [
                    as_[o] * jnp.where(first > 0.5, 1.0, ok[o])
                    for o in range(n_off)
                ]

        # spring forces on the extended window (reactions from upper-halo
        # owners land in the interior via the reverse roll; see halo.py);
        # stacked 3D rolls: one roll moves all three component planes
        f = jnp.zeros((3, ext, nx), jnp.float32)
        for o, (di, dj, k, rest) in enumerate(offsets):
            mask = (aw[o] if tearing
                    else _global_edge_mask(ext, nx, ny, row0, di, dj))
            rest_eff = rest if sw is None else rest * sw[o]
            xn = _kroll(xw, di, dj)
            vn = _kroll(vw, di, dj)
            d = xn - xw
            d2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            inv_len = jax.lax.rsqrt(jnp.maximum(d2, 1e-24))
            length = d2 * inv_len
            n = d * inv_len[None]
            dv = vn - vw
            rel_v = dv[0] * n[0] + dv[1] * n[1] + dv[2] * n[2]
            fmag = (k * (length - rest_eff) + damping * rel_v) * mask
            fo = fmag[None] * n
            f = f + fo - _kroll(fo, -di, -dj)
        if wind_on:
            # normals at interior rows only read x within the 1-ring, which
            # is inside the DMA'd halo; wrap contamination stays in the halo
            # rows the interior slice below discards
            f = f + wind_forces_grid(
                xw, vw, cfg, shift=_kroll,
                cell_mask=_global_edge_mask(ext, nx, ny, row0, 1, 1),
            )

        im = im_ref[:]                       # [tile, nx] interior inv-mass
        movable = im > 0.0
        sl = lambda a: a[HPAD : HPAD + tile, :]
        vz = []
        for c, gc in enumerate(g):
            fc = sl(f[c])
            vc = (sl(vw[c]) + dt * (gc + fc * im)) * (1.0 - gdamp * dt)
            vz.append(jnp.where(movable, vc, 0.0))
        xz = [sl(xw[c]) + dt * vz[c] for c in range(3)]
        if plane_on:
            wp = [plane_ref[0, 1 + c] for c in range(3)]
            contact = (xz[1] < plane_y) & movable
            xz[1] = jnp.where(contact, plane_y, xz[1])
            vy = vz[1]
            uy = vy - wp[1]
            vz[1] = jnp.where(
                contact, jnp.where(uy < 0.0, wp[1] - restitution * uy, vy), vy
            )
            fr = 1.0 - friction
            vz[0] = jnp.where(contact, wp[0] + (vz[0] - wp[0]) * fr, vz[0])
            vz[2] = jnp.where(contact, wp[2] + (vz[2] - wp[2]) * fr, vz[2])
        if spheres_on:
            xz, vz = _resolve_spheres_velocity(
                xz, vz, movable, sph_ref, n_spheres, restitution, friction
            )
        if n_caps_on or n_boxes_on:
            xz, vz = _resolve_capsules_boxes_smem(
                xz, vz, movable, cap_ref, n_caps_on,
                box_ref, n_boxes_on, restitution, friction,
            )
        for c in range(3):
            xo_ref[c] = xz[c]
            vo_ref[c] = vz[c]
        if feat:
            planes = (aw if tearing else []) + (sw if plastic else [])
            for p, w_ in enumerate(planes):
                ao_ref[p] = w_[HPAD : HPAD + tile, :]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cfg", "offsets", "tile", "dt", "n_substeps", "interpret")
)
def _tiled_substeps(x3, v3, inv_mass2d, alive3, plane_h, spheres, capsules,
                    boxes, cfg, offsets, tile, dt, n_substeps,
                    interpret=False):
    ny, nx = x3.shape[-2], x3.shape[-1]
    n_tiles = ny // tile
    n_spheres = spheres.shape[0] if spheres.shape[0] > 0 else 0
    n_capsules = capsules.shape[0]
    n_boxes = boxes.shape[0]
    tearing = cfg.tear.enabled
    plastic = cfg.plasticity.enabled
    feat = tearing or plastic
    n_off = len(offsets)
    n_feat = n_off * (int(tearing) + int(plastic))
    kernel = _make_kernel(cfg, offsets, ny, nx, tile, dt, n_spheres,
                          n_capsules, n_boxes)
    sph = spheres if n_spheres > 0 else jnp.zeros((1, 7), jnp.float32)
    capsules = capsules if n_capsules > 0 else jnp.zeros((1, 10), jnp.float32)
    boxes = boxes if n_boxes > 0 else jnp.zeros((1, 18), jnp.float32)

    state_shape = jax.ShapeDtypeStruct((3, ny, nx), jnp.float32)
    state_spec = pl.BlockSpec((3, tile, nx), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),      # plane row (1,4): y, conveyor velocity
        pl.BlockSpec(memory_space=pltpu.SMEM),      # spheres [S,7]
        pl.BlockSpec(memory_space=pltpu.SMEM),      # capsules [C,10]
        pl.BlockSpec(memory_space=pltpu.SMEM),      # boxes [B,18]
    ]
    if feat:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # first flag
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.ANY),       # x in HBM
        pl.BlockSpec(memory_space=pltpu.ANY),       # v in HBM
        pl.BlockSpec((tile, nx), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),      # inv-mass interior
    ]
    out_shape = (state_shape, state_shape)
    out_specs = (state_spec, state_spec)
    scratch = [
        pltpu.VMEM((3, tile + 2 * HPAD, nx), jnp.float32),
        pltpu.VMEM((3, tile + 2 * HPAD, nx), jnp.float32),
    ]
    if feat:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))  # feat HBM
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((n_feat, ny, nx), jnp.float32),
        )
        out_specs = out_specs + (
            pl.BlockSpec((n_feat, tile, nx), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        )
        scratch.append(pltpu.VMEM((n_feat, tile + 2 * HPAD, nx), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((9 if feat else 6,)))

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        # tearing's liveness planes push the per-tile working set just past
        # the 16 MB default scoped-vmem limit; v5e has 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    if feat:
        def body(carry, k):
            x3, v3, a3 = carry
            first = (k == 0).astype(jnp.float32).reshape(1, 1)
            xo, vo, ao = call(plane_h.reshape(1, 4), sph, capsules, boxes,
                              first, x3, v3, inv_mass2d, a3)
            return (xo, vo, ao), None

        (xo, vo, ao), _ = jax.lax.scan(
            body, (x3, v3, alive3), jnp.arange(n_substeps)
        )
        return xo, vo, ao

    def body(carry, _):
        x3, v3 = carry
        xo, vo = call(plane_h.reshape(1, 4), sph, capsules, boxes, x3, v3,
                      inv_mass2d)
        return (xo, vo), None

    (xo, vo), _ = jax.lax.scan(body, (x3, v3), None, length=n_substeps)
    return xo, vo, None


def make_tiled_step(top: Topology, cfg: SimConfig, tile: int = 0,
                    interpret: bool = False):
    """Build ``fn(state, dt, n_substeps)`` for grids too large for the
    whole-VMEM kernel.  Requires ``ny % tile == 0``; plane + sphere
    colliders (sphere geometry via SMEM).  ``tile=0`` auto-sizes so the
    working set (~20 live planes of ``(tile+16, nx)``) stays inside the
    16 MB VMEM scope.

    Tearing / plasticity: per-offset liveness and rest-scale planes travel
    HBM->VMEM with the state (the per-launch halo DMA refreshes them
    across tiles).  Kernels update them at launch START from their input
    positions — the previous launch's post-substep x — which reproduces
    the oracle's end-of-substep updates exactly; a first-launch flag skips
    the spurious initial update and the frame wrapper applies the final
    end-of-frame updates in XLA."""
    if cfg.collision.enable_sdf and top.n_sdfs > 0:
        raise ValueError(
            "sdf (mesh) colliders are not supported in the fused kernels; "
            "the stencil/jnp paths resolve them"
        )
    ny, nx = top.grid_shape
    if tile == 0:
        tile = max(HPAD, ((64 * 1024) // nx) // HPAD * HPAD)
        while ny % tile != 0 and tile > HPAD:
            tile -= HPAD
    if ny % tile != 0:
        raise ValueError(f"ny={ny} must be a multiple of tile={tile}")
    if tile % HPAD != 0 or tile < HPAD:
        raise ValueError(f"tile={tile} must be a multiple of {HPAD}")
    has_shear = EDGE_SHEAR in top.edge_classes_present
    has_bend = EDGE_BEND in top.edge_classes_present
    offsets = tuple(_offsets(cfg, top.grid_spacing, has_shear, has_bend))
    feat = cfg.tear.enabled or cfg.plasticity.enabled
    if feat:
        to_planes, finish = _feature_plane_maps(top, cfg, offsets, ny, nx)

    def fn(state: State, dt: float, n_substeps: int) -> State:
        x3 = state.x.T.reshape(3, ny, nx)
        v3 = state.v.T.reshape(3, ny, nx)
        im = top.inv_mass.reshape(ny, nx)
        a3 = to_planes(state) if feat else jnp.zeros((1, 1, 1), jnp.float32)
        spheres = _pack_spheres(top)
        xo, vo, ao = _tiled_substeps(
            x3, v3, im, a3, _pack_plane(top), spheres, _pack_capsules(top),
            _pack_boxes(top), cfg, offsets, int(tile),
            float(dt), int(n_substeps), interpret,
        )
        x = xo.reshape(3, -1).T
        v = vo.reshape(3, -1).T
        alive, scale = ((finish(xo, ao, state)) if feat
                        else (state.edge_alive, state.rest_scale))
        return State(x=x, v=v, x_prev=x - dt * v, edge_alive=alive,
                     rest_scale=scale)

    return fn


# ---------------------------------------------------------------------------
# Row-tiled Verlet (same DMA structure as the Euler kernel; carries x, x_prev)
# ---------------------------------------------------------------------------


def _make_verlet_kernel(cfg: SimConfig, offsets, ny: int, nx: int, tile: int,
                        dt: float, n_spheres: int,
                        n_capsules: int = 0, n_boxes: int = 0):
    g = cfg.gravity
    damping = cfg.springs.damping
    gdamp = cfg.global_damping
    plane_on = cfg.collision.enable_plane
    spheres_on = cfg.collision.enable_spheres and n_spheres > 0
    n_caps_on = n_capsules if cfg.collision.enable_capsules else 0
    n_boxes_on = n_boxes if cfg.collision.enable_boxes else 0
    ext = tile + 2 * HPAD
    wind_on = cfg.wind.enabled
    tearing = cfg.tear.enabled
    plastic = cfg.plasticity.enabled
    feat = tearing or plastic
    mu = cfg.collision.friction
    n_off = len(offsets)
    n_feat = n_off * (int(tearing) + int(plastic))
    inv_dt = 1.0 / dt

    def kernel(*refs):
        if feat:
            (plane_ref, sph_ref, cap_ref, box_ref, first_ref, x_hbm, xp_hbm,
             im_ref, a_hbm, xo_ref, xpo_ref, ao_ref, xs, ps, as_, sem) = refs
        else:
            (plane_ref, sph_ref, cap_ref, box_ref, x_hbm, xp_hbm, im_ref,
             xo_ref, xpo_ref, xs, ps, sem) = refs
        i = pl.program_id(0)
        n_tiles = pl.num_programs(0)
        row0 = i * tile - HPAD
        tile0 = pl.multiple_of(i * tile, HPAD)
        tile_up = pl.multiple_of(i * tile - HPAD, HPAD)
        tile_dn = pl.multiple_of((i + 1) * tile, HPAD)
        plane_y = plane_ref[0, 0]

        xs[:, 0:HPAD, :] = jnp.zeros((3, HPAD, nx), jnp.float32)
        ps[:, 0:HPAD, :] = jnp.zeros((3, HPAD, nx), jnp.float32)
        xs[:, tile + HPAD :, :] = jnp.zeros((3, HPAD, nx), jnp.float32)
        ps[:, tile + HPAD :, :] = jnp.zeros((3, HPAD, nx), jnp.float32)
        if feat:
            as_[:, 0:HPAD, :] = jnp.zeros((n_feat, HPAD, nx), jnp.float32)
            as_[:, tile + HPAD :, :] = jnp.zeros((n_feat, HPAD, nx),
                                                 jnp.float32)

        cp_xi = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(tile0, tile), :],
            xs.at[:, pl.ds(HPAD, tile), :], sem.at[0])
        cp_pi = pltpu.make_async_copy(
            xp_hbm.at[:, pl.ds(tile0, tile), :],
            ps.at[:, pl.ds(HPAD, tile), :], sem.at[1])
        cp_xi.start()
        cp_pi.start()
        if feat:
            cp_ai = pltpu.make_async_copy(
                a_hbm.at[:, pl.ds(tile0, tile), :],
                as_.at[:, pl.ds(HPAD, tile), :], sem.at[6])
            cp_ai.start()

        @pl.when(i > 0)
        def _():
            up_x = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(tile_up, HPAD), :],
                xs.at[:, pl.ds(0, HPAD), :], sem.at[2])
            up_p = pltpu.make_async_copy(
                xp_hbm.at[:, pl.ds(tile_up, HPAD), :],
                ps.at[:, pl.ds(0, HPAD), :], sem.at[3])
            up_x.start()
            up_p.start()
            if feat:
                up_a = pltpu.make_async_copy(
                    a_hbm.at[:, pl.ds(tile_up, HPAD), :],
                    as_.at[:, pl.ds(0, HPAD), :], sem.at[7])
                up_a.start()
                up_a.wait()
            up_x.wait()
            up_p.wait()

        @pl.when(i < n_tiles - 1)
        def _():
            dn_x = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(tile_dn, HPAD), :],
                xs.at[:, pl.ds(tile + HPAD, HPAD), :], sem.at[4])
            dn_p = pltpu.make_async_copy(
                xp_hbm.at[:, pl.ds(tile_dn, HPAD), :],
                ps.at[:, pl.ds(tile + HPAD, HPAD), :], sem.at[5])
            dn_x.start()
            dn_p.start()
            if feat:
                dn_a = pltpu.make_async_copy(
                    a_hbm.at[:, pl.ds(tile_dn, HPAD), :],
                    as_.at[:, pl.ds(tile + HPAD, HPAD), :], sem.at[8])
                dn_a.start()
                dn_a.wait()
            dn_x.wait()
            dn_p.wait()

        cp_xi.wait()
        cp_pi.wait()
        if feat:
            cp_ai.wait()

        xw = xs[:]
        pw = ps[:]
        vw = (xw - pw) * inv_dt              # velocity estimate (extended)
        sw = None
        if feat:
            # feature-update-at-start (see _make_kernel): input x is the
            # previous launch's post-substep positions
            from .pallas_substep import _plastic_planes_kroll
            from .stencil import tear_ok_planes

            first = first_ref[0, 0]
            if plastic:
                sw = [as_[n_off * int(tearing) + o] for o in range(n_off)]
                new_sw = _plastic_planes_kroll(xw, offsets, sw,
                                               cfg.plasticity)
                sw = [jnp.where(first > 0.5, sw[o], new_sw[o])
                      for o in range(n_off)]
            if tearing:
                ok = tear_ok_planes(xw, offsets, cfg.tear.strain_limit,
                                    shift=_kroll, rest_scale=sw)
                aw = [
                    as_[o] * jnp.where(first > 0.5, 1.0, ok[o])
                    for o in range(n_off)
                ]

        f = jnp.zeros((3, ext, nx), jnp.float32)
        for o, (di, dj, k, rest) in enumerate(offsets):
            mask = (aw[o] if tearing
                    else _global_edge_mask(ext, nx, ny, row0, di, dj))
            rest_eff = rest if sw is None else rest * sw[o]
            xn = _kroll(xw, di, dj)
            vn = _kroll(vw, di, dj)
            d = xn - xw
            d2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            inv_len = jax.lax.rsqrt(jnp.maximum(d2, 1e-24))
            length = d2 * inv_len
            n = d * inv_len[None]
            dv = vn - vw
            rel_v = dv[0] * n[0] + dv[1] * n[1] + dv[2] * n[2]
            fmag = (k * (length - rest_eff) + damping * rel_v) * mask
            fo = fmag[None] * n
            f = f + fo - _kroll(fo, -di, -dj)
        if wind_on:
            f = f + wind_forces_grid(
                xw, vw, cfg, shift=_kroll,
                cell_mask=_global_edge_mask(ext, nx, ny, row0, 1, 1),
            )

        im = im_ref[:]
        movable = im > 0.0
        sl = lambda a: a[HPAD : HPAD + tile, :]
        xz = []
        for c, gc in enumerate(g):
            fc = sl(f[c])
            accel = gc + fc * im
            xn = (sl(xw[c]) + (sl(xw[c]) - sl(pw[c])) * (1.0 - gdamp * dt)
                  + accel * (dt * dt))
            xz.append(jnp.where(movable, xn, sl(xw[c])))
        if plane_on:
            contact = (xz[1] < plane_y) & movable
            xz[1] = jnp.where(contact, plane_y, xz[1])
        if spheres_on:
            xz = _project_spheres_positions(xz, movable, sph_ref, n_spheres)
        if n_caps_on or n_boxes_on:
            xz = _project_capsules_boxes_smem(
                xz, movable, cap_ref, n_caps_on, box_ref, n_boxes_on
            )
        if plane_on and mu != 0.0:
            # substep-end plane friction at the pre-clamp contact mask
            # (stencil _plane_friction_grid twin)
            for ax in (0, 2):
                target = sl(xw[ax]) + plane_ref[0, 1 + ax] * dt
                xz[ax] = jnp.where(
                    contact, target + (xz[ax] - target) * (1.0 - mu), xz[ax]
                )
        if spheres_on and mu != 0.0:
            from .pallas_substep import _sphere_friction_positions

            xz = _sphere_friction_positions(
                xz, [sl(xw[c]) for c in range(3)], movable, sph_ref,
                n_spheres, mu, dt
            )
        if (n_caps_on or n_boxes_on) and mu != 0.0:
            from .pallas_substep import _rest_friction_smem

            xz = _rest_friction_smem(
                xz, [sl(xw[c]) for c in range(3)], movable, cap_ref,
                n_caps_on, box_ref, n_boxes_on, mu, dt
            )
        for c in range(3):
            xo_ref[c] = xz[c]
            xpo_ref[c] = sl(xw[c])
        if feat:
            planes = (aw if tearing else []) + (sw if plastic else [])
            for p, w_ in enumerate(planes):
                ao_ref[p] = w_[HPAD : HPAD + tile, :]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cfg", "offsets", "tile", "dt", "n_substeps", "interpret")
)
def _tiled_verlet_substeps(x3, xp3, inv_mass2d, alive3, plane_h, spheres,
                           capsules, boxes, cfg, offsets, tile, dt,
                           n_substeps, interpret=False):
    ny, nx = x3.shape[-2], x3.shape[-1]
    n_tiles = ny // tile
    n_spheres = spheres.shape[0] if spheres.shape[0] > 0 else 0
    n_capsules = capsules.shape[0]
    n_boxes = boxes.shape[0]
    tearing = cfg.tear.enabled
    plastic = cfg.plasticity.enabled
    feat = tearing or plastic
    n_off = len(offsets)
    n_feat = n_off * (int(tearing) + int(plastic))
    kernel = _make_verlet_kernel(cfg, offsets, ny, nx, tile, dt, n_spheres,
                                 n_capsules, n_boxes)
    sph = spheres if n_spheres > 0 else jnp.zeros((1, 7), jnp.float32)
    capsules = capsules if n_capsules > 0 else jnp.zeros((1, 10), jnp.float32)
    boxes = boxes if n_boxes > 0 else jnp.zeros((1, 18), jnp.float32)

    state_shape = jax.ShapeDtypeStruct((3, ny, nx), jnp.float32)
    state_spec = pl.BlockSpec((3, tile, nx), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),      # capsules [C,10]
        pl.BlockSpec(memory_space=pltpu.SMEM),      # boxes [B,18]
    ]
    if feat:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # first flag
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec((tile, nx), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = (state_shape, state_shape)
    out_specs = (state_spec, state_spec)
    scratch = [
        pltpu.VMEM((3, tile + 2 * HPAD, nx), jnp.float32),
        pltpu.VMEM((3, tile + 2 * HPAD, nx), jnp.float32),
    ]
    if feat:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))  # feat HBM
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((n_feat, ny, nx), jnp.float32),
        )
        out_specs = out_specs + (
            pl.BlockSpec((n_feat, tile, nx), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        )
        scratch.append(pltpu.VMEM((n_feat, tile + 2 * HPAD, nx), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((9 if feat else 6,)))

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        # see _tiled_substeps: tearing planes exceed the 16 MB default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    if feat:
        def body(carry, k):
            x3, xp3, a3 = carry
            first = (k == 0).astype(jnp.float32).reshape(1, 1)
            xo, xpo, ao = call(plane_h.reshape(1, 4), sph, capsules, boxes,
                               first, x3, xp3, inv_mass2d, a3)
            return (xo, xpo, ao), None

        (xo, xpo, ao), _ = jax.lax.scan(
            body, (x3, xp3, alive3), jnp.arange(n_substeps)
        )
        return xo, xpo, ao

    def body(carry, _):
        x3, xp3 = carry
        return call(plane_h.reshape(1, 4), sph, capsules, boxes, x3, xp3,
                    inv_mass2d), None

    (xo, xpo), _ = jax.lax.scan(body, (x3, xp3), None, length=n_substeps)
    return xo, xpo, None


def make_tiled_verlet_step(top: Topology, cfg: SimConfig, tile: int = 0,
                           interpret: bool = False):
    """Row-tiled fused Verlet for grids beyond the whole-VMEM gate (same
    sizing and feature-plane rules as make_tiled_step)."""
    if cfg.collision.enable_sdf and top.n_sdfs > 0:
        raise ValueError(
            "sdf (mesh) colliders are not supported in the fused kernels; "
            "the stencil/jnp paths resolve them"
        )
    ny, nx = top.grid_shape
    if tile == 0:
        tile = max(HPAD, ((64 * 1024) // nx) // HPAD * HPAD)
        while ny % tile != 0 and tile > HPAD:
            tile -= HPAD
    if ny % tile != 0:
        raise ValueError(f"ny={ny} must be a multiple of tile={tile}")
    if tile % HPAD != 0 or tile < HPAD:
        raise ValueError(f"tile={tile} must be a multiple of {HPAD}")
    has_shear = EDGE_SHEAR in top.edge_classes_present
    has_bend = EDGE_BEND in top.edge_classes_present
    offsets = tuple(_offsets(cfg, top.grid_spacing, has_shear, has_bend))
    feat = cfg.tear.enabled or cfg.plasticity.enabled
    if feat:
        to_planes, finish = _feature_plane_maps(top, cfg, offsets, ny, nx)

    def fn(state: State, dt: float, n_substeps: int) -> State:
        x3 = state.x.T.reshape(3, ny, nx)
        xp3 = state.x_prev.T.reshape(3, ny, nx)
        im = top.inv_mass.reshape(ny, nx)
        a3 = to_planes(state) if feat else jnp.zeros((1, 1, 1), jnp.float32)
        spheres = _pack_spheres(top)
        xo, xpo, ao = _tiled_verlet_substeps(
            x3, xp3, im, a3, _pack_plane(top), spheres, _pack_capsules(top),
            _pack_boxes(top), cfg, offsets, int(tile),
            float(dt), int(n_substeps), interpret,
        )
        x = xo.reshape(3, -1).T
        xp = xpo.reshape(3, -1).T
        alive, scale = ((finish(xo, ao, state)) if feat
                        else (state.edge_alive, state.rest_scale))
        return State(x=x, v=(x - xp) / dt, x_prev=xp, edge_alive=alive,
                     rest_scale=scale)

    return fn


# ---------------------------------------------------------------------------
# Row-tiled XPBD: overlapping halos wide enough for ALL Jacobi iterations
# ---------------------------------------------------------------------------
#
# Unlike Euler (reach = 1 substep), an XPBD substep runs ``n_iterations``
# Jacobi sweeps and halos cannot be refreshed between sweeps inside one
# launch (grid programs are sequential).  Standard overlapping-domain trick:
# each tile DMAs a halo of ``reach * n_iterations`` rows and runs the WHOLE
# substep locally — contamination from the window edge creeps inward
# ``reach`` rows per sweep, so the interior stays exactly equal to the
# global computation.  The redundant halo compute is the price of keeping
# the sweeps in VMEM.


def _make_xpbd_tiled_kernel(cfg: SimConfig, xoffsets, ny: int, nx: int,
                            tile: int, xh: int, dt: float, n_spheres: int,
                            n_capsules: int = 0, n_boxes: int = 0):
    g = cfg.gravity
    gdamp = cfg.global_damping
    omega = cfg.xpbd.relaxation
    n_iter = cfg.xpbd.n_iterations
    plane_on = cfg.collision.enable_plane
    spheres_on = cfg.collision.enable_spheres and n_spheres > 0
    n_caps_on = n_capsules if cfg.collision.enable_capsules else 0
    n_boxes_on = n_boxes if cfg.collision.enable_boxes else 0
    n_off = len(xoffsets)
    wind_on = cfg.wind.enabled
    tearing = cfg.tear.enabled
    plastic = cfg.plasticity.enabled
    feat = tearing or plastic
    n_feat = n_off * (int(tearing) + int(plastic))
    mu = cfg.collision.friction
    alpha_ts = [alpha / (dt * dt) for _, _, alpha, _ in xoffsets]
    ext = tile + 2 * xh

    def kernel(*refs):
        if feat:
            (plane_ref, sph_ref, cap_ref, box_ref, first_ref, x_hbm, v_hbm,
             im_hbm, a_hbm, xo_ref, vo_ref, ao_ref, xs, vs, ims, as_,
             sem) = refs
        else:
            (plane_ref, sph_ref, cap_ref, box_ref, x_hbm, v_hbm, im_hbm,
             xo_ref, vo_ref, xs, vs, ims, sem) = refs
        i = pl.program_id(0)
        n_tiles = pl.num_programs(0)
        row0 = i * tile - xh
        tile0 = pl.multiple_of(i * tile, HPAD)
        tile_up = pl.multiple_of(i * tile - xh, HPAD)
        tile_dn = pl.multiple_of((i + 1) * tile, HPAD)
        plane_y = plane_ref[0, 0]

        # zero halos first (missing neighbours must read 0.0, not garbage)
        xs[:, 0:xh, :] = jnp.zeros((3, xh, nx), jnp.float32)
        vs[:, 0:xh, :] = jnp.zeros((3, xh, nx), jnp.float32)
        ims[0:xh, :] = jnp.zeros((xh, nx), jnp.float32)
        xs[:, tile + xh :, :] = jnp.zeros((3, xh, nx), jnp.float32)
        vs[:, tile + xh :, :] = jnp.zeros((3, xh, nx), jnp.float32)
        ims[tile + xh :, :] = jnp.zeros((xh, nx), jnp.float32)
        if feat:
            as_[:, 0:xh, :] = jnp.zeros((n_feat, xh, nx), jnp.float32)
            as_[:, tile + xh :, :] = jnp.zeros((n_feat, xh, nx), jnp.float32)

        cps = [
            pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(tile0, tile), :],
                xs.at[:, pl.ds(xh, tile), :], sem.at[0]),
            pltpu.make_async_copy(
                v_hbm.at[:, pl.ds(tile0, tile), :],
                vs.at[:, pl.ds(xh, tile), :], sem.at[1]),
            pltpu.make_async_copy(
                im_hbm.at[pl.ds(tile0, tile), :],
                ims.at[pl.ds(xh, tile), :], sem.at[2]),
        ]
        if feat:
            cps.append(pltpu.make_async_copy(
                a_hbm.at[:, pl.ds(tile0, tile), :],
                as_.at[:, pl.ds(xh, tile), :], sem.at[9]))
        for cp in cps:
            cp.start()

        @pl.when(i > 0)
        def _():
            ups = [
                pltpu.make_async_copy(
                    x_hbm.at[:, pl.ds(tile_up, xh), :],
                    xs.at[:, pl.ds(0, xh), :], sem.at[3]),
                pltpu.make_async_copy(
                    v_hbm.at[:, pl.ds(tile_up, xh), :],
                    vs.at[:, pl.ds(0, xh), :], sem.at[4]),
                pltpu.make_async_copy(
                    im_hbm.at[pl.ds(tile_up, xh), :],
                    ims.at[pl.ds(0, xh), :], sem.at[5]),
            ]
            if feat:
                ups.append(pltpu.make_async_copy(
                    a_hbm.at[:, pl.ds(tile_up, xh), :],
                    as_.at[:, pl.ds(0, xh), :], sem.at[10]))
            for cp in ups:
                cp.start()
            for cp in ups:
                cp.wait()

        @pl.when(i < n_tiles - 1)
        def _():
            dns = [
                pltpu.make_async_copy(
                    x_hbm.at[:, pl.ds(tile_dn, xh), :],
                    xs.at[:, pl.ds(tile + xh, xh), :], sem.at[6]),
                pltpu.make_async_copy(
                    v_hbm.at[:, pl.ds(tile_dn, xh), :],
                    vs.at[:, pl.ds(tile + xh, xh), :], sem.at[7]),
                pltpu.make_async_copy(
                    im_hbm.at[pl.ds(tile_dn, xh), :],
                    ims.at[pl.ds(tile + xh, xh), :], sem.at[8]),
            ]
            if feat:
                dns.append(pltpu.make_async_copy(
                    a_hbm.at[:, pl.ds(tile_dn, xh), :],
                    as_.at[:, pl.ds(tile + xh, xh), :], sem.at[11]))
            for cp in dns:
                cp.start()
            for cp in dns:
                cp.wait()

        for cp in cps:
            cp.wait()

        w = ims[:]                            # [ext, nx]
        movable = w > 0.0
        xw = xs[:]
        vw = vs[:]
        sw = None
        if feat:
            # feature-update-at-start (see _make_kernel); wrap garbage sits
            # in the bottom 2 window rows — the xh budget reserves them, so
            # the per-sweep contamination creep never reaches the interior
            from .pallas_substep import _plastic_planes_kroll
            from .stencil import tear_ok_planes

            first = first_ref[0, 0]
            if plastic:
                sw = [as_[n_off * int(tearing) + o] for o in range(n_off)]
                new_sw = _plastic_planes_kroll(xw, xoffsets, sw,
                                               cfg.plasticity)
                sw = [jnp.where(first > 0.5, sw[o], new_sw[o])
                      for o in range(n_off)]
        if tearing:
            ok = tear_ok_planes(xw, xoffsets, cfg.tear.strain_limit,
                                shift=_kroll, rest_scale=sw)
            masks = [
                as_[o] * jnp.where(first > 0.5, 1.0, ok[o])
                for o in range(n_off)
            ]
        else:
            masks = [
                _global_edge_mask(ext, nx, ny, row0, di, dj)
                for di, dj, _, _ in xoffsets
            ]
        # plastic rest scales are substep-constant (oracle: the flow
        # updates at substep END, i.e. at the next launch's start)
        rest_effs = [
            rest if sw is None else rest * sw[o]
            for o, (_, _, _, rest) in enumerate(xoffsets)
        ]
        cnt = jnp.zeros((ext, nx), jnp.float32)
        for (di, dj, _, _), m in zip(xoffsets, masks):
            cnt = cnt + m + _kroll(m, -di, -dj)
        inv_cnt = omega / jnp.maximum(cnt, 1.0)

        # predict: pointwise except wind lift, whose 1-ring normal read
        # contaminates only the outermost window row per side — the xh
        # budget in make_tiled_xpbd_step reserves that extra row
        xp = [xw[c] for c in range(3)]
        if wind_on:
            fw = wind_forces_grid(
                xw, vw, cfg, shift=_kroll,
                cell_mask=_global_edge_mask(ext, nx, ny, row0, 1, 1),
            )
        vp = []
        for c, gc in enumerate(g):
            acc = gc + fw[c] * w if wind_on else gc
            vc = (vw[c] + dt * acc) * (1.0 - gdamp * dt)
            vp.append(jnp.where(movable, vc, 0.0))
        # delta-form accumulation (f32 drift control; see
        # kernels/stencil.py xpbd_substep_grid)
        dl = [dt * vp[c] for c in range(3)]

        def iteration(_, it_carry):
            dl0, dl1, dl2, cf = it_carry[0:4]
            lams = list(it_carry[4:])
            xcur = (xp[0] + dl0, xp[1] + dl1, xp[2] + dl2)
            dx = [jnp.zeros((ext, nx), jnp.float32) for _ in range(3)]
            new_lams = []
            for o, (di, dj, alpha, rest) in enumerate(xoffsets):
                xn = [_kroll(xcur[c], di, dj) for c in range(3)]
                d = [xn[c] - xcur[c] for c in range(3)]
                d2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
                inv_len = jax.lax.rsqrt(jnp.maximum(d2, 1e-24))
                length = d2 * inv_len
                c_val = length - rest_effs[o]
                wn = _kroll(w, di, dj)
                inv_denom = masks[o] / jnp.maximum(w + wn + alpha_ts[o], 1e-12)
                dlam = -(c_val + alpha_ts[o] * lams[o]) * inv_denom
                new_lams.append(lams[o] + dlam)
                wdl_a = w * dlam * inv_len
                wdl_b = wn * dlam * inv_len
                for c in range(3):
                    ca = -(wdl_a * d[c])
                    cb = wdl_b * d[c]
                    dx[c] = dx[c] + ca + _kroll(cb, -di, -dj)
            dl0 = dl0 + dx[0] * inv_cnt
            dl1 = dl1 + dx[1] * inv_cnt
            dl2 = dl2 + dx[2] * inv_cnt
            if plane_on:
                # OR of the pre-clamp masks -> substep-end friction (f32
                # 0/1 plane — Mosaic-safe carry)
                xe1 = xp[1] + dl1
                contact = (xe1 < plane_y) & movable
                dl1 = jnp.where(contact, plane_y - xp[1], dl1)
                cf = jnp.maximum(cf, jnp.where(contact, 1.0, 0.0))
            if spheres_on:
                xe = [xp[0] + dl0, xp[1] + dl1, xp[2] + dl2]
                xpr = _project_spheres_positions(
                    list(xe), movable, sph_ref, n_spheres
                )
                dl0 = dl0 + (xpr[0] - xe[0])
                dl1 = dl1 + (xpr[1] - xe[1])
                dl2 = dl2 + (xpr[2] - xe[2])
            if n_caps_on or n_boxes_on:
                xe = [xp[0] + dl0, xp[1] + dl1, xp[2] + dl2]
                xpr = _project_capsules_boxes_smem(
                    list(xe), movable, cap_ref, n_caps_on,
                    box_ref, n_boxes_on,
                )
                dl0 = dl0 + (xpr[0] - xe[0])
                dl1 = dl1 + (xpr[1] - xe[1])
                dl2 = dl2 + (xpr[2] - xe[2])
            return (dl0, dl1, dl2, cf, *new_lams)

        zeros = tuple(jnp.zeros((ext, nx), jnp.float32) for _ in range(n_off))
        cf0 = jnp.zeros((ext, nx), jnp.float32)
        out = jax.lax.fori_loop(
            0, n_iter, iteration, (dl[0], dl[1], dl[2], cf0, *zeros),
            unroll=1
        )
        dlf = [jnp.where(movable, out[c], 0.0) for c in range(3)]
        if plane_on and mu != 0.0:
            # plane friction ONCE per substep at the OR'd pre-clamp mask
            # (stencil xpbd twin, delta form)
            fric = out[3] > 0.0
            for ax in (0, 2):
                wdt = plane_ref[0, 1 + ax] * dt
                dlf[ax] = jnp.where(
                    fric, wdt + (dlf[ax] - wdt) * (1.0 - mu), dlf[ax]
                )
        if spheres_on and mu != 0.0:
            from .pallas_substep import _sphere_friction_positions

            xe = [xp[c] + dlf[c] for c in range(3)]
            xf = _sphere_friction_positions(
                list(xe), xp, movable, sph_ref, n_spheres, mu, dt
            )
            dlf = [dlf[c] + (xf[c] - xe[c]) for c in range(3)]
        if (n_caps_on or n_boxes_on) and mu != 0.0:
            from .pallas_substep import _rest_friction_smem

            xe = [xp[c] + dlf[c] for c in range(3)]
            xf = _rest_friction_smem(
                list(xe), xp, movable, cap_ref, n_caps_on, box_ref,
                n_boxes_on, mu, dt
            )
            dlf = [dlf[c] + (xf[c] - xe[c]) for c in range(3)]
        sl = lambda a: a[xh : xh + tile, :]
        for c in range(3):
            xo_ref[c] = sl(xp[c] + dlf[c])
            vo_ref[c] = sl(dlf[c] * (1.0 / dt))
        if feat:
            planes = (masks if tearing else []) + (sw if plastic else [])
            for p, w_ in enumerate(planes):
                ao_ref[p] = w_[xh : xh + tile, :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "xoffsets", "tile", "xh", "dt", "n_substeps", "interpret"),
)
def _tiled_xpbd_substeps(x3, v3, inv_mass2d, alive3, plane_h, spheres,
                         capsules, boxes, cfg, xoffsets, tile, xh, dt,
                         n_substeps, interpret=False):
    ny, nx = x3.shape[-2], x3.shape[-1]
    n_tiles = ny // tile
    n_spheres = spheres.shape[0] if spheres.shape[0] > 0 else 0
    n_capsules = capsules.shape[0]
    n_boxes = boxes.shape[0]
    tearing = cfg.tear.enabled
    plastic = cfg.plasticity.enabled
    feat = tearing or plastic
    n_off = len(xoffsets)
    n_feat = n_off * (int(tearing) + int(plastic))
    kernel = _make_xpbd_tiled_kernel(cfg, xoffsets, ny, nx, tile, xh, dt,
                                     n_spheres, n_capsules, n_boxes)
    sph = spheres if n_spheres > 0 else jnp.zeros((1, 7), jnp.float32)
    capsules = capsules if n_capsules > 0 else jnp.zeros((1, 10), jnp.float32)
    boxes = boxes if n_boxes > 0 else jnp.zeros((1, 18), jnp.float32)

    state_shape = jax.ShapeDtypeStruct((3, ny, nx), jnp.float32)
    state_spec = pl.BlockSpec((3, tile, nx), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),      # capsules [C,10]
        pl.BlockSpec(memory_space=pltpu.SMEM),      # boxes [B,18]
    ]
    if feat:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # first flag
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.ANY),       # x in HBM
        pl.BlockSpec(memory_space=pltpu.ANY),       # v in HBM
        pl.BlockSpec(memory_space=pltpu.ANY),       # inv-mass in HBM
    ]
    out_shape = (state_shape, state_shape)
    out_specs = (state_spec, state_spec)
    if feat:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))  # feat HBM
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((n_feat, ny, nx), jnp.float32),
        )
        out_specs = out_specs + (
            pl.BlockSpec((n_feat, tile, nx), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        )

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((3, tile + 2 * xh, nx), jnp.float32),
            pltpu.VMEM((3, tile + 2 * xh, nx), jnp.float32),
            pltpu.VMEM((tile + 2 * xh, nx), jnp.float32),
        ] + ([pltpu.VMEM((n_feat, tile + 2 * xh, nx), jnp.float32)]
             if feat else [])
        + [pltpu.SemaphoreType.DMA((12 if feat else 9,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    if feat:
        def body(carry, k):
            x3, v3, a3 = carry
            first = (k == 0).astype(jnp.float32).reshape(1, 1)
            xo, vo, ao = call(plane_h.reshape(1, 4), sph, capsules, boxes,
                              first, x3, v3, inv_mass2d, a3)
            return (xo, vo, ao), None

        (xo, vo, ao), _ = jax.lax.scan(
            body, (x3, v3, alive3), jnp.arange(n_substeps)
        )
        return xo, vo, ao

    def body(carry, _):
        x3, v3 = carry
        return call(plane_h.reshape(1, 4), sph, capsules, boxes, x3, v3,
                    inv_mass2d), None

    (xo, vo), _ = jax.lax.scan(body, (x3, v3), None, length=n_substeps)
    return xo, vo, None


def make_tiled_xpbd_step(top: Topology, cfg: SimConfig, tile: int = 0,
                         interpret: bool = False):
    """Row-tiled fused XPBD for grids beyond the whole-VMEM gate.

    Halo rows per side = spring reach x n_iterations (rounded up to the
    8-row DMA alignment); requires ``tile >= halo`` so neighbour DMAs stay
    in range and ``ny % tile == 0``."""
    if cfg.collision.enable_sdf and top.n_sdfs > 0:
        raise ValueError(
            "sdf (mesh) colliders are not supported in the fused kernels; "
            "the stencil/jnp paths resolve them"
        )
    ny, nx = top.grid_shape
    has_shear = EDGE_SHEAR in top.edge_classes_present
    has_bend = EDGE_BEND in top.edge_classes_present
    reach = 2 if has_bend else 1
    # +1 halo row when wind lift is on (the predict's normal read
    # contaminates one extra row per side before the sweeps start); +2
    # when tearing/plasticity (the start-of-launch feature updates' wrap
    # garbage sits in the outermost 2 window rows)
    lift_pad = 1 if cfg.wind.lift != 0.0 else 0
    feat = cfg.tear.enabled or cfg.plasticity.enabled
    feat_pad = 2 if feat else 0
    xh = -(-(reach * cfg.xpbd.n_iterations + lift_pad + feat_pad)
           // HPAD) * HPAD
    if tile == 0:
        tile = max(xh, ((48 * 1024) // nx) // HPAD * HPAD)
        while ny % tile != 0 and tile > xh:
            tile -= HPAD
    if ny % tile != 0 or tile % HPAD != 0 or tile < xh:
        raise ValueError(
            f"tile={tile} must divide ny={ny}, align to {HPAD}, and be >= "
            f"the halo {xh}"
        )
    xoffsets = tuple(_xpbd_offsets(cfg, top.grid_spacing, has_shear, has_bend))
    if feat:
        to_planes, finish = _feature_plane_maps(top, cfg, xoffsets, ny, nx)

    def fn(state: State, dt: float, n_substeps: int) -> State:
        x3 = state.x.T.reshape(3, ny, nx)
        v3 = state.v.T.reshape(3, ny, nx)
        im = top.inv_mass.reshape(ny, nx)
        a3 = to_planes(state) if feat else jnp.zeros((1, 1, 1), jnp.float32)
        spheres = _pack_spheres(top)
        xo, vo, ao = _tiled_xpbd_substeps(
            x3, v3, im, a3, _pack_plane(top), spheres, _pack_capsules(top),
            _pack_boxes(top), cfg, xoffsets, int(tile),
            int(xh), float(dt), int(n_substeps), interpret,
        )
        x = xo.reshape(3, -1).T
        v = vo.reshape(3, -1).T
        alive, scale = ((finish(xo, ao, state)) if feat
                        else (state.edge_alive, state.rest_scale))
        return State(x=x, v=v, x_prev=x - dt * v, edge_alive=alive,
                     rest_scale=scale)

    return fn
