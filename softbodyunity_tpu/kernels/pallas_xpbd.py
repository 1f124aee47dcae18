"""Fused Pallas XPBD kernel for grid cloth (BASELINE.json:9).

Same VMEM-resident design as the Euler kernel (pallas_substep.py): one
kernel call runs all substeps; each substep predicts, then runs
``n_iterations`` Jacobi constraint-projection sweeps with per-offset lambda
planes carried in registers/VMEM, then projects collisions and recovers
velocities.  HBM is touched twice per frame.

Loop-invariant hoisting beyond the stencil path: the Jacobi denominator
``w_a + w_b + alpha~`` and the edge-ownership mask fuse into one
precomputed ``inv_denom`` plane per spring class, so the inner sweep is
shift, distance, one fused multiply-add chain, and the reaction shift.
Semantics match kernels/stencil.py::xpbd_substep_grid (tested).
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
    MAX_VMEM_VERTICES,
    _edge_mask,
    _kroll,
    _pack_boxes,
    _pack_capsules,
    _pack_plane,
    _pack_spheres,
    _project_capsules_boxes_smem,
    _project_spheres_positions,
)
from .stencil import _xpbd_offsets, wind_forces_grid


def _make_kernel(cfg: SimConfig, xoffsets, ny: int, nx: int,
                 dt: float, n_substeps: int, n_spheres: int,
                 n_capsules: int = 0, n_boxes: int = 0):
    g = cfg.gravity
    gdamp = cfg.global_damping
    omega = cfg.xpbd.relaxation
    n_iter = cfg.xpbd.n_iterations
    plane_on = cfg.collision.enable_plane
    spheres_on = cfg.collision.enable_spheres and n_spheres > 0
    n_caps_on = n_capsules if cfg.collision.enable_capsules else 0
    n_boxes_on = n_boxes if cfg.collision.enable_boxes else 0
    wind_on = cfg.wind.enabled
    tearing = cfg.tear.enabled
    plastic = cfg.plasticity.enabled
    strain_on = cfg.strain_limit.enabled
    sl = cfg.strain_limit
    mu = cfg.collision.friction
    n_off = len(xoffsets)

    def kernel(plane_ref, sph_ref, cap_ref, box_ref, x_ref, v_ref, im_ref,
               *refs):
        refs = list(refs)
        a_ref = refs.pop(0) if tearing else None
        s_ref = refs.pop(0) if plastic else None
        xo_ref, vo_ref = refs.pop(0), refs.pop(0)
        ao_ref = refs.pop(0) if tearing else None
        so_ref = refs.pop(0) if plastic else None
        w = im_ref[:]
        movable = w > 0.0
        plane_y = plane_ref[0, 0]
        cell_mask = _edge_mask(ny, nx, 1, 1)  # wind-lift normals

        # per-offset count for Jacobi averaging (one persistent plane);
        # inv_denom / wn are recomputed per offset inside the sweep instead
        # of hoisted — keeping ~12 planes live across both loops pushes the
        # Mosaic VMEM stack past 16M at large n_substeps.  Under tearing
        # the count depends on the liveness planes, which change per
        # substep — it moves into the substep body.
        alpha_ts = [alpha / (dt * dt) for _, _, alpha, _ in xoffsets]
        if not tearing:
            cnt = jnp.zeros((ny, nx), jnp.float32)
            for di, dj, alpha, rest in xoffsets:
                m = _edge_mask(ny, nx, di, dj)
                cnt = cnt + m + _kroll(m, -di, -dj)
            inv_cnt_static = omega / jnp.maximum(cnt, 1.0)

        def substep(_, carry):
            x = list(carry[0:3])
            v = list(carry[3:6])
            extra = list(carry[6:])
            alive = extra[:n_off] if tearing else None
            # plastic rest scale is substep-constant (oracle: the update
            # runs after the iteration loop); read-only inside iteration
            scale = extra[n_off if tearing else 0:] if plastic else None
            if tearing:
                cnt = jnp.zeros((ny, nx), jnp.float32)
                for o, (di, dj, _a, _r) in enumerate(xoffsets):
                    cnt = cnt + alive[o] + _kroll(alive[o], -di, -dj)
                inv_cnt = omega / jnp.maximum(cnt, 1.0)
            else:
                inv_cnt = inv_cnt_static
            # predict (external wind forces enter here, oracle substep_xpbd)
            if wind_on:
                fw = wind_forces_grid(
                    jnp.stack(x), jnp.stack(v), cfg, shift=_kroll,
                    cell_mask=cell_mask,
                )
            for c, gc in enumerate(g):
                acc = gc + fw[c] * w if wind_on else gc
                vc = (v[c] + dt * acc) * (1.0 - gdamp * dt)
                v[c] = jnp.where(movable, vc, 0.0)
            xp = [x[c] for c in range(3)]
            # delta-form accumulation (f32 drift control; see
            # kernels/stencil.py xpbd_substep_grid): the loop carries the
            # substep's total position change, never a rounded x
            dl = [dt * v[c] for c in range(3)]

            def iteration(_, it_carry):
                dl0, dl1, dl2, cf = it_carry[0:4]
                lams = list(it_carry[4:])
                xs = (xp[0] + dl0, xp[1] + dl1, xp[2] + dl2)
                dx = [jnp.zeros((ny, nx), jnp.float32) for _ in range(3)]
                new_lams = []
                for o, (di, dj, alpha, rest) in enumerate(xoffsets):
                    xn = [_kroll(xs[c], di, dj) for c in range(3)]
                    d = [xn[c] - xs[c] for c in range(3)]
                    d2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
                    inv_len = jax.lax.rsqrt(jnp.maximum(d2, 1e-24))
                    length = d2 * inv_len
                    rest_eff = rest if scale is None else rest * scale[o]
                    c_val = length - rest_eff
                    wn = _kroll(w, di, dj)
                    m = alive[o] if tearing else _edge_mask(ny, nx, di, dj)
                    inv_denom = m / jnp.maximum(
                        w + wn + alpha_ts[o], 1e-12
                    )
                    dlam = -(c_val + alpha_ts[o] * lams[o]) * inv_denom
                    new_lams.append(lams[o] + dlam)
                    wdl_a = w * dlam * inv_len
                    wdl_b = wn * dlam * inv_len
                    for c in range(3):
                        # grad is n = d * inv_len; fold inv_len into wdl
                        ca = -(wdl_a * d[c])
                        cb = wdl_b * d[c]
                        dx[c] = dx[c] + ca + _kroll(cb, -di, -dj)
                dl0 = dl0 + dx[0] * inv_cnt
                dl1 = dl1 + dx[1] * inv_cnt
                dl2 = dl2 + dx[2] * inv_cnt
                if plane_on:
                    # contacts projected inside the loop (oracle
                    # substep_xpbd), rebased into delta form; the OR of the
                    # pre-clamp masks feeds the substep-end friction (f32
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

            zeros = tuple(jnp.zeros((ny, nx), jnp.float32) for _ in range(n_off))
            cf0 = jnp.zeros((ny, nx), jnp.float32)
            out = jax.lax.fori_loop(
                0, n_iter, iteration, (dl[0], dl[1], dl[2], cf0, *zeros),
                unroll=1
            )
            dl = [jnp.where(movable, out[c], 0.0) for c in range(3)]
            cf = out[3]
            if strain_on:
                from .pallas_substep import _strain_limit_planes

                # strain limiting after the Jacobi loop, then ONE more
                # contact projection so the sweeps never leave penetration
                # behind (oracle substep_xpbd); dx self-masks at pinned
                # vertices (inv-mass weighting)
                masks = (alive if tearing
                         else [_edge_mask(ny, nx, di, dj)
                               for di, dj, _a, _r in xoffsets])
                xe = [xp[c] + dl[c] for c in range(3)]
                dxl = _strain_limit_planes(
                    xe, xoffsets, masks, w, sl,
                    scales=scale if plastic else None,
                )
                dl = [dl[c] + dxl[c] for c in range(3)]
                if plane_on:
                    xe1 = xp[1] + dl[1]
                    contact = (xe1 < plane_y) & movable
                    dl[1] = jnp.where(contact, plane_y - xp[1], dl[1])
                    cf = jnp.maximum(cf, jnp.where(contact, 1.0, 0.0))
                if spheres_on:
                    xe = [xp[c] + dl[c] for c in range(3)]
                    xpr = _project_spheres_positions(
                        list(xe), movable, sph_ref, n_spheres
                    )
                    dl = [dl[c] + (xpr[c] - xe[c]) for c in range(3)]
                if n_caps_on or n_boxes_on:
                    xe = [xp[c] + dl[c] for c in range(3)]
                    xpr = _project_capsules_boxes_smem(
                        list(xe), movable, cap_ref, n_caps_on,
                        box_ref, n_boxes_on,
                    )
                    dl = [dl[c] + (xpr[c] - xe[c]) for c in range(3)]
            if plane_on and mu != 0.0:
                # plane friction ONCE per substep (stencil xpbd twin):
                # damp the tangential delta relative to the plane surface
                # velocity at the OR'd pre-clamp contact mask
                fric = cf > 0.0
                for ax in (0, 2):
                    wdt = plane_ref[0, 1 + ax] * dt
                    dl[ax] = jnp.where(
                        fric, wdt + (dl[ax] - wdt) * (1.0 - mu), dl[ax]
                    )
            if spheres_on and mu != 0.0:
                from .pallas_substep import _sphere_friction_positions

                xe = [xp[c] + dl[c] for c in range(3)]
                xf = _sphere_friction_positions(
                    list(xe), xp, movable, sph_ref, n_spheres, mu, dt
                )
                dl = [dl[c] + (xf[c] - xe[c]) for c in range(3)]
            if (n_caps_on or n_boxes_on) and mu != 0.0:
                from .pallas_substep import _rest_friction_smem

                xe = [xp[c] + dl[c] for c in range(3)]
                xf = _rest_friction_smem(
                    list(xe), xp, movable, cap_ref, n_caps_on, box_ref,
                    n_boxes_on, mu, dt
                )
                dl = [dl[c] + (xf[c] - xe[c]) for c in range(3)]
            x = [xp[c] + dl[c] for c in range(3)]
            v = [dl[c] * (1.0 / dt) for c in range(3)]
            if plastic:
                from .pallas_substep import _plastic_planes_kroll

                scale = _plastic_planes_kroll(
                    jnp.stack(x), xoffsets, scale, cfg.plasticity
                )
            if tearing:
                from .pallas_substep import _tear_planes_kroll

                alive = _tear_planes_kroll(
                    jnp.stack(x), xoffsets, alive, cfg.tear.strain_limit,
                    rest_scale=scale if plastic else None,
                )
            tail = (alive if tearing else []) + (scale if plastic else [])
            return (x[0], x[1], x[2], v[0], v[1], v[2], *tail)

        init = (x_ref[0], x_ref[1], x_ref[2], v_ref[0], v_ref[1], v_ref[2])
        if tearing:
            init = init + tuple(a_ref[o] for o in range(n_off))
        if plastic:
            init = init + tuple(s_ref[o] for o in range(n_off))
        # unroll=1: Mosaic otherwise unrolls static trip counts and the
        # per-iteration stack allocations exceed the 16M VMEM scope
        out = jax.lax.fori_loop(0, n_substeps, substep, init, unroll=1)
        xo_ref[0], xo_ref[1], xo_ref[2] = out[0], out[1], out[2]
        vo_ref[0], vo_ref[1], vo_ref[2] = out[3], out[4], out[5]
        base = 6
        if tearing:
            for o in range(n_off):
                ao_ref[o] = out[base + o]
            base += n_off
        if plastic:
            for o in range(n_off):
                so_ref[o] = out[base + o]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cfg", "xoffsets", "dt", "n_substeps", "interpret")
)
def _pallas_xpbd_substeps(x3, v3, inv_mass2d, alive3, scale3, plane_h,
                          spheres, capsules, boxes, cfg, xoffsets, dt,
                          n_substeps, interpret=False):
    ny, nx = x3.shape[-2], x3.shape[-1]
    n_spheres = spheres.shape[0] if spheres.shape[0] > 0 else 0
    n_capsules = capsules.shape[0]
    n_boxes = boxes.shape[0]
    tearing = cfg.tear.enabled
    plastic = cfg.plasticity.enabled
    kernel = _make_kernel(cfg, xoffsets, ny, nx, dt, n_substeps, n_spheres,
                          n_capsules, n_boxes)
    sph = spheres if n_spheres > 0 else jnp.zeros((1, 7), jnp.float32)
    capsules = capsules if n_capsules > 0 else jnp.zeros((1, 10), jnp.float32)
    boxes = boxes if n_boxes > 0 else jnp.zeros((1, 18), jnp.float32)
    state_shape = jax.ShapeDtypeStruct((3, ny, nx), jnp.float32)
    out_shape = (state_shape, state_shape)
    in_specs = [
        pl.BlockSpec((1, 4), memory_space=pltpu.SMEM),
        pl.BlockSpec(sph.shape, memory_space=pltpu.SMEM),
        pl.BlockSpec(capsules.shape, memory_space=pltpu.SMEM),
        pl.BlockSpec(boxes.shape, memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    args = [plane_h.reshape(1, 4), sph, capsules, boxes, x3, v3, inv_mass2d]
    if tearing:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(alive3)
        out_shape = out_shape + (
            jax.ShapeDtypeStruct(alive3.shape, jnp.float32),
        )
        out_specs = out_specs + (pl.BlockSpec(memory_space=pltpu.VMEM),)
    if plastic:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(scale3)
        out_shape = out_shape + (
            jax.ShapeDtypeStruct(scale3.shape, jnp.float32),
        )
        out_specs = out_specs + (pl.BlockSpec(memory_space=pltpu.VMEM),)
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=n_substeps * cfg.xpbd.n_iterations * 3 * ny * nx * len(xoffsets) * 25,
            bytes_accessed=4 * 3 * ny * nx * 4,
            transcendentals=n_substeps * cfg.xpbd.n_iterations * ny * nx * len(xoffsets),
        ),
        interpret=interpret,
    )(*args)
    ao = out[2] if tearing else None
    so = out[3 if tearing else 2] if plastic else None
    return out[0], out[1], ao, so


def make_pallas_xpbd_step(top: Topology, cfg: SimConfig, interpret: bool = False):
    """Build ``fn(state, dt, n_substeps) -> state`` (XPBD, fused kernel).

    Gates: structured grid, VMEM-sized.  Plane/sphere/capsule/box colliders
    are position-projected inside the Jacobi loop (geometry via SMEM).
    Tearing carries per-offset liveness planes; torn edges leave both the
    projection and the per-substep Jacobi count."""
    if cfg.collision.enable_sdf and top.n_sdfs > 0:
        raise ValueError(
            "sdf (mesh) colliders are not supported in the fused kernels; "
            "the stencil/jnp paths resolve them"
        )
    from .stencil import tear_plane_maps

    ny, nx = top.grid_shape
    # tearing / plasticity each carry 3*n_off extra planes through VMEM,
    # so each halves the vertex cap; over-cap grids raise and dispatch
    # degrades loudly
    cap = MAX_VMEM_VERTICES // (
        1 + int(cfg.tear.enabled) + int(cfg.plasticity.enabled)
    )
    if ny * nx > cap:
        raise ValueError("grid too large for the VMEM-resident kernel")
    has_shear = EDGE_SHEAR in top.edge_classes_present
    has_bend = EDGE_BEND in top.edge_classes_present
    xoffsets = tuple(_xpbd_offsets(cfg, top.grid_spacing, has_shear, has_bend))
    tearing = cfg.tear.enabled
    plastic = cfg.plasticity.enabled
    if tearing or plastic:
        alive_to_planes, planes_to_alive = tear_plane_maps(
            top, xoffsets, ny, nx
        )

    def fn(state: State, dt: float, n_substeps: int) -> State:
        x3 = state.x.T.reshape(3, ny, nx)
        v3 = state.v.T.reshape(3, ny, nx)
        im = top.inv_mass.reshape(ny, nx)
        a3 = (alive_to_planes(state.edge_alive) if tearing
              else jnp.zeros((1, 1, 1), jnp.float32))
        s3 = (alive_to_planes(state.rest_scale) if plastic
              else jnp.zeros((1, 1, 1), jnp.float32))
        spheres = _pack_spheres(top)
        xo, vo, ao, so = _pallas_xpbd_substeps(
            x3, v3, im, a3, s3, _pack_plane(top), spheres,
            _pack_capsules(top), _pack_boxes(top), cfg, xoffsets, float(dt),
            int(n_substeps), interpret,
        )
        x = xo.reshape(3, -1).T
        v = vo.reshape(3, -1).T
        return State(
            x=x, v=v, x_prev=x - dt * v,
            edge_alive=planes_to_alive(ao) if tearing else state.edge_alive,
            rest_scale=(planes_to_alive(so) if plastic
                        else state.rest_scale),
        )

    return fn
