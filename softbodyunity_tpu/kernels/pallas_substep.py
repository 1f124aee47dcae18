"""Fused Pallas substep kernel for grid cloth — the flagship hot loop.

This is the TPU-native replacement for the reference's entire per-frame
inner loop ("spring-force accumulation ... semi-implicit Euler ...
plane collision resolve ... becomes fused Pallas kernels over SoA float32
particle arrays", BASELINE.json:5): ONE kernel invocation runs ALL
``n_substeps`` substeps with positions/velocities resident in VMEM, so HBM
is touched exactly twice per frame (load state, store state) instead of
~20 times per substep as in the XLA-fused stencil path.

Kernel anatomy (see /opt/skills/guides/pallas_guide.md):
* single program (no grid): the whole ``[ny, nx]`` component planes sit in
  VMEM — a 256x256 cloth needs ~1.8 MB of state against ~16 MB VMEM; the
  dispatcher gates on ``ny*nx <= 128k`` and falls back to the XLA stencil
  path above that.
* spring stencils are ``pltpu.roll`` + ``broadcasted_iota`` edge masks —
  pure VPU register traffic, no gather/scatter, no pad materialization.
* the substep loop is ``jax.lax.fori_loop`` with the six component planes
  as loop carry.
* scalars (dt, stiffnesses, gravity, friction) are Python floats burned
  into the compiled kernel (SimConfig is static); the ground-plane height
  is topology *data* and arrives via SMEM.

Physics semantics are identical to kernels/stencil.py and therefore to the
float64 oracle (oracle/reference.py substep_euler); tests assert equality.
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
from .stencil import _offsets, wind_forces_grid

MAX_VMEM_VERTICES = 128 * 1024  # gate: state must fit in VMEM


def _kroll(a: jax.Array, di: int, dj: int) -> jax.Array:
    """out[..., i, j] = a[..., (i+di) % ny, (j+dj) % nx] — wrap-around roll
    over the last two axes (2D planes or stacked [3, ny, nx] arrays; one
    3D roll is ~1.7x cheaper than three plane rolls, measured).

    No masking: every use multiplies the rolled value into a lane where the
    *edge-ownership mask* (applied once to ``fmag``) is already zero for
    out-of-range neighbours, including the lanes a reaction roll wraps into
    — so wrapped garbage is always annihilated downstream.  This cuts the
    per-shift cost from roll+2 iota+4 cmp+select to a single roll.
    """
    ny, nx = a.shape[-2], a.shape[-1]
    sub_axis = a.ndim - 2
    lane_axis = a.ndim - 1
    out = a
    if di:
        out = pltpu.roll(out, (-di) % ny, sub_axis)  # roll requires shift >= 0
    if dj:
        out = pltpu.roll(out, (-dj) % nx, lane_axis)
    return out


def _edge_mask(ny: int, nx: int, di: int, dj: int) -> jax.Array:
    """1.0 where vertex (i,j) owns an edge to (i+di, j+dj)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    ok = (rows + di >= 0) & (rows + di < ny) & (cols + dj >= 0) & (cols + dj < nx)
    return ok.astype(jnp.float32)


def _spring_forces_stacked(xst, vst, offsets, masks, damping, ny, nx,
                           scales=None):
    """Hooke + axial damper on stacked [3, ny, nx] planes — the shared
    stencil core of the fused Euler and Verlet kernels.  ``scales``
    (plastic rest-scale planes) rescale the per-offset rest lengths."""
    f = jnp.zeros((3, ny, nx), jnp.float32)
    for o, ((di, dj, k, rest), mask) in enumerate(zip(offsets, masks)):
        xn = _kroll(xst, di, dj)
        vn = _kroll(vst, di, dj)
        d = xn - xst
        d2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        inv_len = jax.lax.rsqrt(jnp.maximum(d2, 1e-24))
        length = d2 * inv_len          # = sqrt(d2)
        n = d * inv_len[None]
        dv = vn - vst
        rel_v = dv[0] * n[0] + dv[1] * n[1] + dv[2] * n[2]
        rest_eff = rest if scales is None else rest * scales[o]
        fmag = (k * (length - rest_eff) + damping * rel_v) * mask
        fo = fmag[None] * n
        f = f + fo - _kroll(fo, -di, -dj)
    return f


def _project_spheres_positions(xz, movable, sph_ref, n_spheres):
    """Position-only sphere push-out (solver/collide.py
    project_positions_only twin) on component-plane lists."""
    for si in range(n_spheres):
        cs = [sph_ref[si, c] for c in range(3)]
        radius = sph_ref[si, 3]
        d = [xz[c] - cs[c] for c in range(3)]
        dist2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        inv_dist = jax.lax.rsqrt(jnp.maximum(dist2, 1e-24))
        dist = dist2 * inv_dist
        pen = radius - dist
        contact = (pen > 0.0) & movable
        pen_pos = jnp.where(contact, pen, 0.0)
        xz = [xz[c] + pen_pos * d[c] * inv_dist for c in range(3)]
    return xz


def _sphere_friction_positions(xz, x_start, movable, sph_ref, n_spheres,
                               mu, dt):
    """Substep-end sphere friction (collide.sphere_friction_positions
    twin) on component-plane lists: damp the tangential substep
    displacement (relative to each sphere's SMEM kinematic velocity) by
    (1 - mu) at the contact shell.  Call ONCE per substep, after the
    plane friction; ``x_start`` = substep-start planes."""
    from ..solver.collide import SPHERE_CONTACT_SHELL

    for si in range(n_spheres):
        cs = [sph_ref[si, c] for c in range(3)]
        radius = sph_ref[si, 3]
        w = [sph_ref[si, 4 + c] for c in range(3)]
        d = [xz[c] - cs[c] for c in range(3)]
        dist2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        inv_dist = jax.lax.rsqrt(jnp.maximum(dist2, 1e-24))
        dist = dist2 * inv_dist
        n = [d[c] * inv_dist for c in range(3)]
        contact = (dist <= radius * SPHERE_CONTACT_SHELL) & movable
        rel = [xz[c] - x_start[c] - w[c] * dt for c in range(3)]
        rel_n = rel[0] * n[0] + rel[1] * n[1] + rel[2] * n[2]
        xz = [
            jnp.where(contact, xz[c] - mu * (rel[c] - rel_n * n[c]), xz[c])
            for c in range(3)
        ]
    return xz


def _rest_friction_smem(xz, xsz, movable, cap_ref, n_capsules, box_ref,
                        n_boxes, mu, dt):
    """Capsule/box position-level friction on component-plane lists with
    SMEM geometry rows (collide.rest_friction_components twin; runs ONCE
    per substep, after the sphere friction).  ``xsz`` = substep-start
    planes; the packed rows carry each collider's kinematic velocity."""
    from ..solver.collide import (
        box_friction_components,
        capsule_friction_components,
    )

    for s in range(n_capsules):
        p0 = [cap_ref[s, c] for c in range(3)]
        p1 = [cap_ref[s, 3 + c] for c in range(3)]
        w = [cap_ref[s, 7 + c] for c in range(3)]
        xz = capsule_friction_components(
            xz, xsz, movable, p0, p1, cap_ref[s, 6], w, mu, dt)
    for s in range(n_boxes):
        ce = [box_ref[s, c] for c in range(3)]
        hf = [box_ref[s, 3 + c] for c in range(3)]
        rot = [[box_ref[s, 6 + 3 * c + i] for i in range(3)]
               for c in range(3)]
        w = [box_ref[s, 15 + c] for c in range(3)]
        xz = box_friction_components(
            xz, xsz, movable, ce, hf, rot, w, mu, dt)
    return xz


def _resolve_spheres_velocity(xz, vz, movable, sph_ref, n_spheres,
                              restitution, friction):
    """Velocity-level sphere resolve (solver/collide.py
    _resolve_one_sphere twin) on component-plane lists."""
    for si in range(n_spheres):
        cs = [sph_ref[si, c] for c in range(3)]
        radius = sph_ref[si, 3]
        d = [xz[c] - cs[c] for c in range(3)]
        dist2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        inv_dist = jax.lax.rsqrt(jnp.maximum(dist2, 1e-24))
        dist = dist2 * inv_dist
        pen = radius - dist
        contact = (pen > 0.0) & movable
        nrm = [d[c] * inv_dist for c in range(3)]
        pen_pos = jnp.where(contact, pen, 0.0)
        xz = [xz[c] + pen_pos * nrm[c] for c in range(3)]
        w = [sph_ref[si, 4 + c] for c in range(3)]
        uz = [vz[c] - w[c] for c in range(3)]
        un = uz[0] * nrm[0] + uz[1] * nrm[1] + uz[2] * nrm[2]
        inward = contact & (un < 0.0)
        rem = jnp.where(inward, (1.0 + restitution) * un, 0.0)
        vz = [vz[c] - rem * nrm[c] for c in range(3)]
        uz = [vz[c] - w[c] for c in range(3)]
        un2 = uz[0] * nrm[0] + uz[1] * nrm[1] + uz[2] * nrm[2]
        fr = 1.0 - friction
        vz = [
            jnp.where(contact,
                      w[c] + un2 * nrm[c] + (uz[c] - un2 * nrm[c]) * fr, vz[c])
            for c in range(3)
        ]
    return xz, vz


def _zero_vel(vel, n) -> jax.Array:
    """Kinematic velocity rows, zeros when the topology carries none."""
    if vel is None:
        return jnp.zeros((n, 3), jnp.float32)
    return vel


def _pack_plane(top: Topology) -> jax.Array:
    """[1, 4] SMEM row: plane height, plane surface (conveyor) velocity."""
    pv = (jnp.zeros(3, jnp.float32) if top.plane_velocity is None
          else top.plane_velocity)
    return jnp.concatenate(
        [top.plane_height.reshape(1), pv.reshape(3)]
    ).astype(jnp.float32).reshape(1, 4)


def _pack_spheres(top: Topology) -> jax.Array:
    """[S, 7] SMEM rows: center (3), radius, kinematic velocity (3)."""
    if top.n_spheres == 0:
        return jnp.zeros((0, 7), jnp.float32)
    return jnp.concatenate(
        [top.sphere_centers, top.sphere_radii[:, None],
         _zero_vel(top.sphere_velocities, top.n_spheres)], axis=1
    ).astype(jnp.float32)


def _pack_capsules(top: Topology) -> jax.Array:
    """[C, 10] SMEM rows: p0 (3), p1 (3), radius, kinematic velocity (3)."""
    if top.n_capsules == 0:
        return jnp.zeros((0, 10), jnp.float32)
    return jnp.concatenate(
        [top.capsule_p0, top.capsule_p1, top.capsule_radii[:, None],
         _zero_vel(top.capsule_velocities, top.n_capsules)], axis=1
    ).astype(jnp.float32)


def _pack_boxes(top: Topology) -> jax.Array:
    """[B, 18] SMEM rows: center (3), half extents (3), R row-major (9),
    kinematic velocity (3)."""
    if top.n_boxes == 0:
        return jnp.zeros((0, 18), jnp.float32)
    return jnp.concatenate(
        [top.box_centers, top.box_half_extents,
         top.box_rotations.reshape(-1, 9),
         _zero_vel(top.box_velocities, top.n_boxes)], axis=1
    ).astype(jnp.float32)


def _resolve_capsules_boxes_smem(xz, vz, movable, cap_ref, n_capsules,
                                 box_ref, n_boxes, restitution, friction):
    """Velocity-level capsule/box resolve on component-plane lists with
    SMEM-scalar geometry — runs the exact solver/collide.py component
    formulation (single source of truth for the math)."""
    from ..solver.collide import (
        box_resolve_components,
        capsule_resolve_components,
    )

    for s in range(n_capsules):
        p0 = [cap_ref[s, c] for c in range(3)]
        p1 = [cap_ref[s, 3 + c] for c in range(3)]
        w = [cap_ref[s, 7 + c] for c in range(3)]
        xz, vz = capsule_resolve_components(
            xz, vz, movable, p0, p1, cap_ref[s, 6], restitution, friction,
            w=w,
        )
    for s in range(n_boxes):
        ce = [box_ref[s, c] for c in range(3)]
        hf = [box_ref[s, 3 + c] for c in range(3)]
        rot = [[box_ref[s, 6 + 3 * c + i] for i in range(3)] for c in range(3)]
        w = [box_ref[s, 15 + c] for c in range(3)]
        xz, vz = box_resolve_components(
            xz, vz, movable, ce, hf, rot, restitution, friction, w=w,
        )
    return xz, vz


def _project_capsules_boxes_smem(xz, movable, cap_ref, n_capsules,
                                 box_ref, n_boxes):
    """Position-only capsule/box push-out (Verlet/XPBD paths)."""
    from ..solver.collide import (
        box_project_components,
        capsule_project_components,
    )

    for s in range(n_capsules):
        p0 = [cap_ref[s, c] for c in range(3)]
        p1 = [cap_ref[s, 3 + c] for c in range(3)]
        xz = capsule_project_components(xz, movable, p0, p1, cap_ref[s, 6])
    for s in range(n_boxes):
        ce = [box_ref[s, c] for c in range(3)]
        hf = [box_ref[s, 3 + c] for c in range(3)]
        rot = [[box_ref[s, 6 + 3 * c + i] for i in range(3)] for c in range(3)]
        xz = box_project_components(xz, movable, ce, hf, rot)
    return xz


def _strain_limit_planes(xz, offsets, masks, im, sl, scales=None):
    """Strain-limit Jacobi sweeps on component-plane lists (oracle
    strain_limit_dx twin, solver/strainlimit.py banded form with the
    Pallas wrap-roll as the shift): edges outside the rest-length band
    project back to the nearest bound, vertex updates averaged over the
    alive incident edges.  ``masks`` is the live edge-ownership planes
    (the tear liveness planes when tearing is on — torn edges stop
    limiting, the oracle rule); ``scales`` rescales rest (plasticity).
    Returns the total dx planes [3, ny, nx]."""
    cnt = jnp.zeros_like(im)
    for (di, dj, _, _), m in zip(offsets, masks):
        cnt = cnt + m + _kroll(m, -di, -dj)
    inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)
    xst0 = jnp.stack(xz)
    xst = xst0
    for _ in range(sl.iterations):
        dx = jnp.zeros_like(xst)
        for o, ((di, dj, _, rest), mask) in enumerate(zip(offsets, masks)):
            xn = _kroll(xst, di, dj)
            d = xn - xst
            d2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            inv_len = jax.lax.rsqrt(jnp.maximum(d2, 1e-24))
            length = d2 * inv_len
            n = d * inv_len[None]
            rest_eff = rest if scales is None else rest * scales[o]
            hi = rest_eff * (1.0 + sl.max_stretch)
            lo = (rest_eff * (1.0 - sl.max_compress)
                  if sl.max_compress >= 0.0 else 0.0)
            c_val = (length - jnp.clip(length, lo, hi)) * mask
            wn = _kroll(im, di, dj)
            corr = c_val / jnp.maximum(im + wn, 1e-12)
            dx = dx + (im * corr)[None] * n \
                - _kroll((wn * corr)[None] * n, -di, -dj)
        xst = xst + dx * inv_cnt[None]
    return xst - xst0


def _tear_planes_kroll(xst, offsets, alive, strain_limit, rest_scale=None):
    """Per-substep tear update inside a kernel: the single-source stencil
    tear check with the Pallas wrap-roll as its shift primitive."""
    from .stencil import tear_update_grid

    return list(tear_update_grid(xst, offsets, alive, strain_limit,
                                 shift=_kroll, rest_scale=rest_scale))


def _plastic_planes_kroll(xst, offsets, scale, pp):
    """Per-substep plastic flow inside a kernel (stencil
    plastic_update_grid with the wrap-roll shift)."""
    from .stencil import plastic_update_grid

    return list(plastic_update_grid(xst, offsets, scale, pp, shift=_kroll))


def _make_kernel(cfg: SimConfig, offsets, ny: int, nx: int,
                 dt: float, n_substeps: int, n_spheres: int,
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
    wind_on = cfg.wind.enabled
    tearing = cfg.tear.enabled
    plastic = cfg.plasticity.enabled
    strain_on = cfg.strain_limit.enabled
    sl = cfg.strain_limit
    n_off = len(offsets)
    inv_dt = 1.0 / dt

    def kernel(plane_ref, sph_ref, cap_ref, box_ref, x_ref, v_ref, im_ref,
               *refs):
        refs = list(refs)
        a_ref = refs.pop(0) if tearing else None
        s_ref = refs.pop(0) if plastic else None
        xo_ref, vo_ref = refs.pop(0), refs.pop(0)
        ao_ref = refs.pop(0) if tearing else None
        so_ref = refs.pop(0) if plastic else None
        im = im_ref[:]                        # [ny, nx] inv mass
        movable = im > 0.0
        plane_y = plane_ref[0, 0]
        # loop-invariant edge-ownership masks, hoisted out of the substep
        # loop; under tearing the carried liveness planes subsume them
        if not tearing:
            masks = [_edge_mask(ny, nx, di, dj) for di, dj, _, _ in offsets]
        cell_mask = _edge_mask(ny, nx, 1, 1)  # wind-lift normals

        def substep(_, carry):
            x0, x1, x2, v0, v1, v2 = carry[:6]
            extra = list(carry[6:])
            alive = extra[:n_off] if tearing else None
            scale = extra[n_off if tearing else 0:] if plastic else None
            mlist = alive if tearing else masks
            xs = (x0, x1, x2)
            vs = (v0, v1, v2)
            f = _spring_forces_stacked(
                jnp.stack(xs), jnp.stack(vs), offsets, mlist, damping,
                ny, nx, scales=scale,
            )
            if wind_on:
                f = f + wind_forces_grid(
                    jnp.stack(xs), jnp.stack(vs), cfg, shift=_kroll,
                    cell_mask=cell_mask,
                )
            vz = []
            for c, gc in enumerate(g):
                vc = (vs[c] + dt * (gc + f[c] * im)) * (1.0 - gdamp * dt)
                vz.append(jnp.where(movable, vc, 0.0))
            xz = [xs[c] + dt * vz[c] for c in range(3)]
            if strain_on:
                # strain limiting after integration, before contact; the
                # clamp feeds back into velocity (oracle substep_euler)
                dxl = _strain_limit_planes(
                    xz, offsets, mlist, im, sl,
                    scales=scale if plastic else None,
                )
                for c in range(3):
                    xz[c] = xz[c] + dxl[c]
                    vz[c] = vz[c] + dxl[c] * inv_dt
            if plane_on:
                wp = [plane_ref[0, 1 + c] for c in range(3)]
                contact = (xz[1] < plane_y) & movable
                xz[1] = jnp.where(contact, plane_y, xz[1])
                vy = vz[1]
                uy = vy - wp[1]
                vz[1] = jnp.where(
                    contact,
                    jnp.where(uy < 0.0, wp[1] - restitution * uy, vy),
                    vy,
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
            # end-of-substep feature updates: plastic flow first, then the
            # tear check against the rescaled rest (oracle ordering)
            if plastic:
                scale = _plastic_planes_kroll(
                    jnp.stack(xz), offsets, scale, cfg.plasticity
                )
            if tearing:
                alive = _tear_planes_kroll(
                    jnp.stack(xz), offsets, alive, cfg.tear.strain_limit,
                    rest_scale=scale if plastic else None,
                )
            tail = (alive if tearing else []) + (scale if plastic else [])
            return (xz[0], xz[1], xz[2], vz[0], vz[1], vz[2], *tail)

        init = (
            x_ref[0], x_ref[1], x_ref[2],
            v_ref[0], v_ref[1], v_ref[2],
        )
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
    jax.jit, static_argnames=("cfg", "offsets", "dt", "n_substeps", "interpret")
)
def _pallas_substeps(x3, v3, inv_mass2d, alive3, scale3, plane_h, spheres,
                     capsules, boxes, cfg, offsets, dt, n_substeps,
                     interpret=False):
    ny, nx = x3.shape[-2], x3.shape[-1]
    n_spheres = spheres.shape[0] if spheres.shape[0] > 0 else 0
    n_capsules = capsules.shape[0]
    n_boxes = boxes.shape[0]
    tearing = cfg.tear.enabled
    plastic = cfg.plasticity.enabled
    kernel = _make_kernel(cfg, offsets, ny, nx, dt, n_substeps, n_spheres,
                          n_capsules, n_boxes)
    sph = spheres if n_spheres > 0 else jnp.zeros((1, 7), jnp.float32)
    capsules = capsules if n_capsules > 0 else jnp.zeros((1, 10), jnp.float32)
    boxes = boxes if n_boxes > 0 else jnp.zeros((1, 18), jnp.float32)
    flops_per_sub = 3 * ny * nx * len(offsets) * 30
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
            flops=n_substeps * flops_per_sub,
            bytes_accessed=4 * 3 * ny * nx * 4,
            transcendentals=n_substeps * ny * nx * len(offsets),
        ),
        # tearing/plastic feature planes push the 64k working set a few
        # hundred KB past the 16 MB default scoped-vmem limit (v5e has
        # 128 MB physical VMEM); same override as the lattice/tiled kernels
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    ao = out[2] if tearing else None
    so = out[3 if tearing else 2] if plastic else None
    return out[0], out[1], ao, so


def make_pallas_step(top: Topology, cfg: SimConfig, interpret: bool = False):
    """Build ``fn(state, dt, n_substeps) -> state`` running the fused kernel.

    Requirements (dispatcher-gated): structured grid with uniform spacing,
    Euler solver, <= MAX_VMEM_VERTICES vertices.  All four primitive
    colliders (plane/sphere/capsule/box) are supported; geometry arrives
    via SMEM so batched scenes can move their colliders without
    recompiling.  Tearing (TearParams) carries per-offset liveness planes
    through the VMEM-resident substep loop.
    """
    if cfg.collision.enable_sdf and top.n_sdfs > 0:
        raise ValueError(
            "sdf (mesh) colliders are not supported in the fused kernels; "
            "the stencil/jnp paths resolve them"
        )
    from .stencil import tear_plane_maps

    ny, nx = top.grid_shape
    # tearing / plasticity each carry 3*n_off extra planes (input + loop
    # carry + output) through VMEM, so each halves the vertex cap;
    # over-cap grids raise and dispatch degrades loudly
    cap = MAX_VMEM_VERTICES // (
        1 + int(cfg.tear.enabled) + int(cfg.plasticity.enabled)
    )
    if ny * nx > cap:
        raise ValueError("grid too large for the VMEM-resident kernel")
    has_shear = EDGE_SHEAR in top.edge_classes_present
    has_bend = EDGE_BEND in top.edge_classes_present
    offsets = tuple(_offsets(cfg, top.grid_spacing, has_shear, has_bend))
    tearing = cfg.tear.enabled
    plastic = cfg.plasticity.enabled
    if tearing or plastic:
        alive_to_planes, planes_to_alive = tear_plane_maps(
            top, offsets, ny, nx
        )

    def fn(state: State, dt: float, n_substeps: int) -> State:
        x3 = state.x.T.reshape(3, ny, nx)
        v3 = state.v.T.reshape(3, ny, nx)
        im = top.inv_mass.reshape(ny, nx)
        a3 = (alive_to_planes(state.edge_alive) if tearing
              else jnp.zeros((1, 1, 1), jnp.float32))
        s3 = (alive_to_planes(state.rest_scale) if plastic
              else jnp.zeros((1, 1, 1), jnp.float32))
        xo, vo, ao, so = _pallas_substeps(
            x3, v3, im, a3, s3, _pack_plane(top), _pack_spheres(top),
            _pack_capsules(top), _pack_boxes(top), cfg, offsets, float(dt),
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


# ---------------------------------------------------------------------------
# Fused Verlet kernel (same VMEM-resident design; carries (x, x_prev))
# ---------------------------------------------------------------------------

def _make_verlet_kernel(cfg: SimConfig, offsets, ny: int, nx: int,
                        dt: float, n_substeps: int, n_spheres: int,
                        n_capsules: int = 0, n_boxes: int = 0):
    g = cfg.gravity
    damping = cfg.springs.damping
    gdamp = cfg.global_damping
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
    n_off = len(offsets)
    inv_dt = 1.0 / dt

    def kernel(plane_ref, sph_ref, cap_ref, box_ref, x_ref, xp_ref, im_ref,
               *refs):
        refs = list(refs)
        a_ref = refs.pop(0) if tearing else None
        s_ref = refs.pop(0) if plastic else None
        xo_ref, xpo_ref = refs.pop(0), refs.pop(0)
        ao_ref = refs.pop(0) if tearing else None
        so_ref = refs.pop(0) if plastic else None
        im = im_ref[:]
        movable = im > 0.0
        plane_y = plane_ref[0, 0]
        if not tearing:
            masks = [_edge_mask(ny, nx, di, dj) for di, dj, _, _ in offsets]
        cell_mask = _edge_mask(ny, nx, 1, 1)  # wind-lift normals

        def substep(_, carry):
            x0, x1, x2, p0, p1, p2 = carry[:6]
            extra = list(carry[6:])
            alive = extra[:n_off] if tearing else None
            scale = extra[n_off if tearing else 0:] if plastic else None
            mlist = alive if tearing else masks
            xs = (x0, x1, x2)
            ps = (p0, p1, p2)
            v_est = [(xs[c] - ps[c]) * inv_dt for c in range(3)]
            f = _spring_forces_stacked(
                jnp.stack(xs), jnp.stack(v_est), offsets, mlist, damping,
                ny, nx, scales=scale,
            )
            if wind_on:
                f = f + wind_forces_grid(
                    jnp.stack(xs), jnp.stack(v_est), cfg, shift=_kroll,
                    cell_mask=cell_mask,
                )
            xz = []
            for c, gc in enumerate(g):
                accel = gc + f[c] * im
                xn = xs[c] + (xs[c] - ps[c]) * (1.0 - gdamp * dt) + accel * (dt * dt)
                xz.append(jnp.where(movable, xn, xs[c]))
            if strain_on:
                # strain limiting after integration, before contact
                # (position-only; oracle substep_verlet)
                dxl = _strain_limit_planes(
                    xz, offsets, mlist, im, sl,
                    scales=scale if plastic else None,
                )
                xz = [xz[c] + dxl[c] for c in range(3)]
            # position-only collide (kernels/stencil.py verlet twin)
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
                # (stencil.py _plane_friction_grid twin); plane_ref[0,1:4]
                # is the plane SURFACE (conveyor) velocity
                for ax in (0, 2):
                    target = xs[ax] + plane_ref[0, 1 + ax] * dt
                    xz[ax] = jnp.where(
                        contact, target + (xz[ax] - target) * (1.0 - mu),
                        xz[ax],
                    )
            if spheres_on and mu != 0.0:
                xz = _sphere_friction_positions(
                    xz, xs, movable, sph_ref, n_spheres, mu, dt
                )
            if (n_caps_on or n_boxes_on) and mu != 0.0:
                xz = _rest_friction_smem(
                    xz, list(xs), movable, cap_ref, n_caps_on, box_ref,
                    n_boxes_on, mu, dt
                )
            if plastic:
                scale = _plastic_planes_kroll(
                    jnp.stack(xz), offsets, scale, cfg.plasticity
                )
            if tearing:
                alive = _tear_planes_kroll(
                    jnp.stack(xz), offsets, alive, cfg.tear.strain_limit,
                    rest_scale=scale if plastic else None,
                )
            tail = (alive if tearing else []) + (scale if plastic else [])
            return (xz[0], xz[1], xz[2], x0, x1, x2, *tail)

        init = (
            x_ref[0], x_ref[1], x_ref[2],
            xp_ref[0], xp_ref[1], xp_ref[2],
        )
        if tearing:
            init = init + tuple(a_ref[o] for o in range(n_off))
        if plastic:
            init = init + tuple(s_ref[o] for o in range(n_off))
        # unroll=1: Mosaic otherwise unrolls static trip counts and the
        # per-iteration stack allocations exceed the 16M VMEM scope
        out = jax.lax.fori_loop(0, n_substeps, substep, init, unroll=1)
        xo_ref[0], xo_ref[1], xo_ref[2] = out[0], out[1], out[2]
        xpo_ref[0], xpo_ref[1], xpo_ref[2] = out[3], out[4], out[5]
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
    jax.jit, static_argnames=("cfg", "offsets", "dt", "n_substeps", "interpret")
)
def _pallas_verlet_substeps(x3, xp3, inv_mass2d, alive3, scale3, plane_h,
                            spheres, capsules, boxes, cfg, offsets, dt,
                            n_substeps, interpret=False):
    ny, nx = x3.shape[-2], x3.shape[-1]
    n_spheres = spheres.shape[0] if spheres.shape[0] > 0 else 0
    n_capsules = capsules.shape[0]
    n_boxes = boxes.shape[0]
    tearing = cfg.tear.enabled
    plastic = cfg.plasticity.enabled
    kernel = _make_verlet_kernel(cfg, offsets, ny, nx, dt, n_substeps,
                                 n_spheres, n_capsules, n_boxes)
    sph = spheres if n_spheres > 0 else jnp.zeros((1, 7), jnp.float32)
    capsules = capsules if n_capsules > 0 else jnp.zeros((1, 10), jnp.float32)
    boxes = boxes if n_boxes > 0 else jnp.zeros((1, 18), jnp.float32)
    flops_per_sub = 3 * ny * nx * len(offsets) * 30
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
    args = [plane_h.reshape(1, 4), sph, capsules, boxes, x3, xp3, inv_mass2d]
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
            flops=n_substeps * flops_per_sub,
            bytes_accessed=4 * 3 * ny * nx * 4,
            transcendentals=n_substeps * ny * nx * len(offsets),
        ),
        # tearing/plastic feature planes push the 64k working set a few
        # hundred KB past the 16 MB default scoped-vmem limit (v5e has
        # 128 MB physical VMEM); same override as the lattice/tiled kernels
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    ao = out[2] if tearing else None
    so = out[3 if tearing else 2] if plastic else None
    return out[0], out[1], ao, so


def make_pallas_verlet_step(top: Topology, cfg: SimConfig,
                            interpret: bool = False):
    """Build ``fn(state, dt, n_substeps) -> state`` for the fused Verlet
    kernel (same gates as the Euler kernel; plane/sphere/capsule/box
    colliders are position-only projected, mirroring kernels/stencil.py
    verlet_substep_grid).  Tearing (liveness) and plasticity (rest-scale)
    carry per-offset planes."""
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
    offsets = tuple(_offsets(cfg, top.grid_spacing, has_shear, has_bend))
    tearing = cfg.tear.enabled
    plastic = cfg.plasticity.enabled
    if tearing or plastic:
        alive_to_planes, planes_to_alive = tear_plane_maps(
            top, offsets, ny, nx
        )

    def fn(state: State, dt: float, n_substeps: int) -> State:
        x3 = state.x.T.reshape(3, ny, nx)
        xp3 = state.x_prev.T.reshape(3, ny, nx)
        im = top.inv_mass.reshape(ny, nx)
        a3 = (alive_to_planes(state.edge_alive) if tearing
              else jnp.zeros((1, 1, 1), jnp.float32))
        s3 = (alive_to_planes(state.rest_scale) if plastic
              else jnp.zeros((1, 1, 1), jnp.float32))
        xo, xpo, ao, so = _pallas_verlet_substeps(
            x3, xp3, im, a3, s3, _pack_plane(top), _pack_spheres(top),
            _pack_capsules(top), _pack_boxes(top), cfg, offsets, float(dt),
            int(n_substeps), interpret,
        )
        x = xo.reshape(3, -1).T
        xp = xpo.reshape(3, -1).T
        return State(
            x=x, v=(x - xp) / dt, x_prev=xp,
            edge_alive=planes_to_alive(ao) if tearing else state.edge_alive,
            rest_scale=(planes_to_alive(so) if plastic
                        else state.rest_scale),
        )

    return fn
