"""Fused Pallas substep kernel for banded lattices — the volumetric hot loop.

The tet-cube preset (BASELINE.json:10 "tet-mesh edge springs +
volume-preservation constraint") is delta-banded with zero residual: every
spring is one of ~9 flat index deltas and every tet one of ~10 delta
patterns (solver/banded.py groups them at build time).  This kernel fuses
the whole Euler substep — banded spring forces, integration, banded PBD
volume projection, plane/sphere collision — into ONE VMEM-resident Pallas
program running all ``n_substeps``, exactly the transformation
kernels/pallas_substep.py applies to grid cloth.  Verlet
(:func:`make_lattice_verlet_step`) and XPBD
(:func:`make_lattice_xpbd_step`) variants share the banded spring /
volume-projection machinery, closing the lattice column of the
solver matrix.

The state lives as ``[3, S, 128]`` planes (flat vertex axis folded to
sublane x lane).  A *flat* roll by delta ``d`` decomposes into one lane
roll plus two sublane rolls and a lane-boundary select::

    d = q*128 + r
    out[s, l] = x[s + q, l + r]          if l + r < 128
              = x[s + q + 1, l + r - 128] otherwise

(`_flat_roll`), so the per-edge/per-tet gather of the reference's inner
loop is pure VPU register traffic — no gathers, no scatters, no pad
materialization.  Wrapped lanes always multiply into mask-zeroed positions
(same annihilation argument as solver/banded.py).

Per-group stiffness/rest/rest-volume are uniform for lattice meshes and are
burned in as compile-time scalars (OffsetGroups.uniform /
TetGroups.uniform_rest_volume); only the 0/1 ownership masks travel to VMEM.

Physics semantics are identical to solver/step.py::substep_euler on the
banded path and therefore to the float64 oracle; tests assert equality.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import SimConfig, Solver
from ..core.state import State
from ..core.topology import Topology
from .pallas_substep import (
    _pack_boxes,
    _pack_capsules,
    _pack_plane,
    _pack_spheres,
    _project_capsules_boxes_smem,
    _project_spheres_positions,
    _resolve_capsules_boxes_smem,
    _resolve_spheres_velocity,
)

LANES = 128
# VMEM budget: persistent planes (state in/out, masks, cnt) plus Mosaic's
# scoped stack for the unrolled tet-group loop (~150 plane-equivalents
# measured at 64k: 35.6M stack / 256K per plane); v5e has 128M physical.
MAX_VMEM_BYTES = 100 * 1024 * 1024
_STACK_PLANES = 150


def _flat_roll(a: jax.Array, d: int, s_dim: int) -> jax.Array:
    """out[..., s, l] = a_flat[(s*128 + l + d) mod (S*128)] over the folded
    last-two axes.  ``d`` may be negative (normalized mod S*128)."""
    ntot = s_dim * LANES
    dn = d % ntot
    if dn == 0:
        return a
    q, r = divmod(dn, LANES)
    sub_axis = a.ndim - 2
    lane_axis = a.ndim - 1
    if r == 0:
        return pltpu.roll(a, (-q) % s_dim, sub_axis)
    lane_rolled = pltpu.roll(a, LANES - r, lane_axis)   # lane index + r
    lo = pltpu.roll(lane_rolled, (-q) % s_dim, sub_axis)        # sub + q
    hi = pltpu.roll(lo, s_dim - 1, sub_axis)                    # sub + q + 1
    lanes = jax.lax.broadcasted_iota(jnp.int32, (s_dim, LANES), 1)
    return jnp.where(lanes < LANES - r, lo, hi)


def _cross(a, b):
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def _hoist_tet_invariants(tm_ref, im, tgroups, s_dim: int, vol_stiff: float):
    """Loop-invariant volume-projection inputs, hoisted out of the substep
    loop: per-vertex tet count (oracle count-averaging, pre-scaled by the
    stiffness) and tet-corner inv-mass rolls (im never changes)."""
    cnt = jnp.zeros((s_dim, LANES), jnp.float32)
    for gi, ((d1, d2, d3), _) in enumerate(tgroups):
        m = tm_ref[gi]
        cnt = (cnt + m + _flat_roll(m, -d1, s_dim)
               + _flat_roll(m, -d2, s_dim) + _flat_roll(m, -d3, s_dim))
    inv_cnt_vs = vol_stiff / jnp.maximum(cnt, 1.0)
    t_w = [
        (_flat_roll(im, d1, s_dim), _flat_roll(im, d2, s_dim),
         _flat_roll(im, d3, s_dim))
        for (d1, d2, d3), _rv in tgroups
    ]
    return inv_cnt_vs, t_w


def _spring_forces_planes(xst, vst, egroups, em_ref, damping: float,
                          s_dim: int):
    """Banded Hooke+damping spring forces on [3, S, 128] planes (twin:
    solver/banded.py spring_forces_banded).  Shared by the Euler and
    Verlet lattice kernels.

    NB a merged [6, S, 128] x+v roll was measured SLOWER (14.1k vs 20.1k
    substeps/s): the concat+slice costs more than the extra roll.  Keep
    two stacked 3-plane rolls."""
    f = jnp.zeros((3, s_dim, LANES), jnp.float32)
    for gi, (delta, k, rest) in enumerate(egroups):
        xb = _flat_roll(xst, delta, s_dim)
        vb = _flat_roll(vst, delta, s_dim)
        d = xb - xst
        d2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        inv_len = jax.lax.rsqrt(jnp.maximum(d2, 1e-24))
        length = d2 * inv_len
        n = d * inv_len[None]
        dv = vb - vst
        rel_v = dv[0] * n[0] + dv[1] * n[1] + dv[2] * n[2]
        fmag = (k * (length - rest) + damping * rel_v) * em_ref[gi]
        fo = fmag[None] * n
        f = f + fo - _flat_roll(fo, -delta, s_dim)
    return f


def _volume_dx(xst, tgroups, tm_ref, t_w, im, s_dim: int):
    """Banded PBD volume projection (solver/banded.py twin) — the raw
    correction sum, before count-averaging.  Shared by the Euler and
    Verlet lattice kernels."""
    x_rolls = {}

    def xroll(d):
        # corner deltas repeat across the 10 tet groups (~30 rolls,
        # ~14 unique); Mosaic does not CSE the decomposed rolls
        if d not in x_rolls:
            x_rolls[d] = _flat_roll(xst, d, s_dim)
        return x_rolls[d]

    # reverse-scatter dedup: rolls are linear, so corner
    # contributions sharing a delta (30 rolls, 11 unique on the
    # 5-tet lattice) are summed BEFORE the single roll per delta
    pending = {}

    def defer(d, contrib):
        pending[d] = (pending[d] + contrib) if d in pending \
            else contrib

    dx = jnp.zeros((3, s_dim, LANES), jnp.float32)
    for gi, ((d1, d2, d3), rest_vol) in enumerate(tgroups):
        m = tm_ref[gi]
        p1 = xroll(d1)
        p2 = xroll(d2)
        p3 = xroll(d3)
        e1 = p1 - xst
        e2 = p2 - xst
        e3 = p3 - xst
        c12 = _cross(e1, e2)
        g1 = _cross(e2, e3) * (1.0 / 6.0)
        g2 = _cross(e3, e1) * (1.0 / 6.0)
        g3 = c12 * (1.0 / 6.0)
        g0 = -(g1 + g2 + g3)
        vol = (c12[0] * e3[0] + c12[1] * e3[1] + c12[2] * e3[2]) / 6.0
        c_val = vol - rest_vol
        w1, w2, w3 = t_w[gi]
        denom = (
            im * (g0[0] * g0[0] + g0[1] * g0[1] + g0[2] * g0[2])
            + w1 * (g1[0] * g1[0] + g1[1] * g1[1] + g1[2] * g1[2])
            + w2 * (g2[0] * g2[0] + g2[1] * g2[1] + g2[2] * g2[2])
            + w3 * (g3[0] * g3[0] + g3[1] * g3[1] + g3[2] * g3[2])
        )
        s = m * (-c_val) / jnp.maximum(denom, 1e-12)
        dx = dx + (im * s)[None] * g0
        defer(d1, (w1 * s)[None] * g1)
        defer(d2, (w2 * s)[None] * g2)
        defer(d3, (w3 * s)[None] * g3)
    for d, acc in pending.items():
        dx = dx + _flat_roll(acc, -d, s_dim)
    return dx


def _lattice_gate_common(top: Topology, cfg: SimConfig,
                         solver: Solver) -> bool:
    """Shared static gate for the fused Euler/Verlet lattice kernels:
    fully banded topology with uniform per-group parameters, VMEM-sized."""
    g = top.offset_groups
    t = top.tet_groups
    if cfg.solver != solver:
        return False
    if cfg.self_collision.enabled:
        return False
    if cfg.collision.enable_sdf and top.n_sdfs > 0:
        # sdf (mesh) colliders resolve on the banded jnp path
        return False
    if cfg.tear.enabled:
        # lattice tearing runs on the jnp gather path (per-edge masks)
        return False
    if cfg.wind.lift != 0.0:
        # lift needs surface-triangle normals (not roll-able on a lattice);
        # the banded jnp path computes them exactly
        return False
    if g is None or len(g.deltas) == 0 or g.n_residual > 0:
        return False
    if any(u is None for u in g.uniform) or len(g.uniform) != len(g.deltas):
        return False
    if t is None or t.n_residual > 0:
        return False
    use_volume = len(t.deltas) > 0 and cfg.volume_stiffness != 0.0
    if use_volume and (
        any(u is None for u in t.uniform_rest_volume)
        or len(t.uniform_rest_volume) != len(t.deltas)
    ):
        return False
    if top.inv_mass.dtype != jnp.float32:
        return False
    n = top.n_vertices
    s_dim = pl.cdiv(n, LANES)
    n_groups = len(g.deltas) + (len(t.deltas) if use_volume else 0)
    # persistent: 6 state in + 6 out + masks + im + cnt + hoisted
    # tet-corner w rolls; transient: stack + reverse-scatter pending
    # accumulators (3 planes per unique tet-corner delta)
    hoisted = 3 * len(t.deltas) if use_volume else 0
    pending = (3 * len({d for pat in t.deltas for d in pat})
               if use_volume else 0)
    planes = 14 + n_groups + hoisted + pending + _STACK_PLANES
    if planes * s_dim * LANES * 4 > MAX_VMEM_BYTES:
        return False
    return True


def lattice_applicable(top: Topology, cfg: SimConfig) -> bool:
    """Static gate for the fused Euler lattice kernel."""
    return _lattice_gate_common(top, cfg, Solver.SEMI_IMPLICIT_EULER)


def lattice_verlet_applicable(top: Topology, cfg: SimConfig) -> bool:
    """Static gate for the fused Verlet lattice kernel (same banded/
    uniform/VMEM requirements; the carry is x + x_prev instead of x + v,
    so the plane accounting is identical)."""
    return _lattice_gate_common(top, cfg, Solver.VERLET)


def _make_kernel(cfg: SimConfig, egroups, tgroups, s_dim: int,
                 dt: float, n_substeps: int, n_spheres: int,
                 n_capsules: int = 0, n_boxes: int = 0):
    """egroups: ((delta, k, rest), ...); tgroups: (((d1,d2,d3), rest_vol), ...)."""
    g = cfg.gravity
    damping = cfg.springs.damping
    gdamp = cfg.global_damping
    restitution = cfg.collision.restitution
    friction = cfg.collision.friction
    plane_on = cfg.collision.enable_plane
    spheres_on = cfg.collision.enable_spheres and n_spheres > 0
    n_caps_on = n_capsules if cfg.collision.enable_capsules else 0
    n_boxes_on = n_boxes if cfg.collision.enable_boxes else 0
    drag = cfg.wind.drag
    wvel = cfg.wind.velocity
    vol_stiff = cfg.volume_stiffness
    use_volume = len(tgroups) > 0 and vol_stiff != 0.0

    def kernel(plane_ref, sph_ref, cap_ref, box_ref, x_ref, v_ref, im_ref,
               em_ref, tm_ref, xo_ref, vo_ref):
        im = im_ref[:]                       # [S, 128] inv mass
        movable = im > 0.0
        plane_y = plane_ref[0, 0]

        if use_volume:
            inv_cnt_vs, t_w = _hoist_tet_invariants(
                tm_ref, im, tgroups, s_dim, vol_stiff
            )

        def substep(_, carry):
            x0, x1, x2, v0, v1, v2 = carry
            xs = jnp.stack((x0, x1, x2))
            vs = jnp.stack((v0, v1, v2))
            f = _spring_forces_planes(xs, vs, egroups, em_ref, damping, s_dim)
            vz = []
            for c, gc in enumerate(g):
                fc = f[c]
                if drag != 0.0:   # isotropic wind drag (lift gated off)
                    fc = fc + drag * (wvel[c] - vs[c])
                vc = ((vs[c] + dt * (gc + fc * im)) * (1.0 - gdamp * dt))
                vz.append(jnp.where(movable, vc, 0.0))
            xz = [xs[c] + dt * vz[c] for c in range(3)]
            if use_volume:
                dxs = _volume_dx(jnp.stack(xz), tgroups, tm_ref, t_w, im,
                                 s_dim)
                for c in range(3):
                    dxc = jnp.where(movable, dxs[c] * inv_cnt_vs, 0.0)
                    xz[c] = xz[c] + dxc
                    vz[c] = vz[c] + dxc * (1.0 / dt)
            if plane_on:
                wp = [plane_ref[0, 1 + c] for c in range(3)]
                contact = (xz[1] < plane_y) & movable
                xz[1] = jnp.where(contact, plane_y, xz[1])
                vy = vz[1]
                uy = vy - wp[1]
                vz[1] = jnp.where(
                    contact,
                    jnp.where(uy < 0.0, wp[1] - restitution * uy, vy), vy
                )
                fr = 1.0 - friction
                vz[0] = jnp.where(contact,
                                  wp[0] + (vz[0] - wp[0]) * fr, vz[0])
                vz[2] = jnp.where(contact,
                                  wp[2] + (vz[2] - wp[2]) * fr, vz[2])
            if spheres_on:
                xz, vz = _resolve_spheres_velocity(
                    xz, vz, movable, sph_ref, n_spheres, restitution, friction
                )
            if n_caps_on or n_boxes_on:
                xz, vz = _resolve_capsules_boxes_smem(
                    xz, vz, movable, cap_ref, n_caps_on,
                    box_ref, n_boxes_on, restitution, friction,
                )
            return (xz[0], xz[1], xz[2], vz[0], vz[1], vz[2])

        init = (
            x_ref[0], x_ref[1], x_ref[2],
            v_ref[0], v_ref[1], v_ref[2],
        )
        # unroll=1: Mosaic otherwise unrolls static trip counts and the
        # per-iteration stack allocations exceed the 16M VMEM scope
        out = jax.lax.fori_loop(0, n_substeps, substep, init, unroll=1)
        xo_ref[0], xo_ref[1], xo_ref[2] = out[0], out[1], out[2]
        vo_ref[0], vo_ref[1], vo_ref[2] = out[3], out[4], out[5]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "egroups", "tgroups", "dt", "n_substeps", "interpret"),
)
def _pallas_lattice_substeps(x3, v3, im2, emask, tmask, plane_h, spheres,
                             capsules, boxes,
                             cfg, egroups, tgroups, dt, n_substeps,
                             interpret=False):
    s_dim = x3.shape[-2]
    n_spheres = spheres.shape[0]
    n_capsules = capsules.shape[0]
    n_boxes = boxes.shape[0]
    kernel = _make_kernel(cfg, egroups, tgroups, s_dim, dt, n_substeps,
                          n_spheres, n_capsules, n_boxes)
    sph = spheres if n_spheres > 0 else jnp.zeros((1, 7), jnp.float32)
    capsules = capsules if n_capsules > 0 else jnp.zeros((1, 10), jnp.float32)
    boxes = boxes if n_boxes > 0 else jnp.zeros((1, 18), jnp.float32)
    n_el = s_dim * LANES
    flops_per_sub = 3 * n_el * (len(egroups) * 30 + len(tgroups) * 70)
    xo, vo = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((3, s_dim, LANES), jnp.float32),
            jax.ShapeDtypeStruct((3, s_dim, LANES), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, 4), memory_space=pltpu.SMEM),
            pl.BlockSpec(sph.shape, memory_space=pltpu.SMEM),
            pl.BlockSpec(capsules.shape, memory_space=pltpu.SMEM),
            pl.BlockSpec(boxes.shape, memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_substeps * flops_per_sub,
            bytes_accessed=4 * 3 * n_el * 4 + (emask.size + tmask.size) * 4,
            transcendentals=n_substeps * n_el * len(egroups),
        ),
        # the tet-volume group loop keeps more transient planes live than
        # Mosaic's default 16M scoped-vmem budget; v5e has 128M physical
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(plane_h.reshape(1, 4), sph, capsules, boxes, x3, v3, im2, emask, tmask)
    return xo, vo


def _fold(a: jax.Array, s_dim: int) -> jax.Array:
    """[..., N] -> zero-padded [..., S, 128]."""
    n = a.shape[-1]
    pad = s_dim * LANES - n
    if pad:
        widths = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
        a = jnp.pad(a, widths)
    return a.reshape(a.shape[:-1] + (s_dim, LANES))


def lattice_xpbd_applicable(top: Topology, cfg: SimConfig) -> bool:
    """Static gate for the fused XPBD lattice kernel (distance + volume
    compliance constraints on a fully banded uniform lattice)."""
    g = top.offset_groups
    t = top.tet_groups
    if cfg.solver != Solver.XPBD:
        return False
    if cfg.self_collision.enabled:
        return False
    if cfg.collision.enable_sdf and top.n_sdfs > 0:
        # sdf (mesh) colliders resolve on the banded jnp path
        return False
    if cfg.tear.enabled:
        # lattice tearing runs on the jnp gather path (per-edge masks)
        return False
    if cfg.wind.lift != 0.0:
        # lift needs surface-triangle normals (not roll-able on a lattice);
        # the banded jnp path computes them exactly
        return False
    if g is None or len(g.deltas) == 0 or g.n_residual > 0:
        return False
    if any(u is None for u in g.uniform) or len(g.uniform) != len(g.deltas):
        return False
    if t is None or t.n_residual > 0:
        return False
    if len(t.deltas) > 0 and (
        any(u is None for u in t.uniform_rest_volume)
        or len(t.uniform_rest_volume) != len(t.deltas)
    ):
        return False
    if top.inv_mass.dtype != jnp.float32:
        return False
    n = top.n_vertices
    s_dim = pl.cdiv(n, LANES)
    # iteration carry: 3 delta + 1 friction-contact + Ge lambda + Gt lambda
    # planes, plus stack, plus the hoisted loop-invariant planes (Ge
    # inv_denom + Ge wn + 3*Gt tet-corner w rolls — w never changes across
    # iterations), plus the reverse-scatter pending accumulators (3 planes
    # per unique edge/tet-corner delta)
    n_groups = len(g.deltas) + len(t.deltas)
    hoisted = 2 * len(g.deltas) + 3 * len(t.deltas)
    pending = 3 * len(set(g.deltas) | {d for pat in t.deltas for d in pat})
    planes = 14 + 2 * n_groups + 4 + hoisted + pending + _STACK_PLANES
    if planes * s_dim * LANES * 4 > MAX_VMEM_BYTES:
        return False
    return True


def _make_xpbd_kernel(cfg: SimConfig, egroups, tgroups, s_dim: int,
                      dt: float, n_substeps: int, n_spheres: int,
                      n_capsules: int = 0, n_boxes: int = 0):
    """egroups: ((delta, rest, alpha), ...); tgroups: (((d1,d2,d3), rv), ...).

    Twin: solver/banded.py xpbd_iteration_banded driven by solver/step.py
    substep_xpbd (delta-form accumulation, contacts inside the loop)."""
    g = cfg.gravity
    gdamp = cfg.global_damping
    omega = cfg.xpbd.relaxation
    n_iter = cfg.xpbd.n_iterations
    drag = cfg.wind.drag
    wvel = cfg.wind.velocity
    alpha_v = cfg.xpbd.compliance_volume / (dt * dt)
    plane_on = cfg.collision.enable_plane
    spheres_on = cfg.collision.enable_spheres and n_spheres > 0
    n_caps_on = n_capsules if cfg.collision.enable_capsules else 0
    n_boxes_on = n_boxes if cfg.collision.enable_boxes else 0
    n_e = len(egroups)
    n_t = len(tgroups)
    mu = cfg.collision.friction
    alpha_ts = [alpha / (dt * dt) for _, _, alpha in egroups]

    def kernel(plane_ref, sph_ref, cap_ref, box_ref, x_ref, v_ref, im_ref,
               em_ref, tm_ref, xo_ref, vo_ref):
        w = im_ref[:]
        movable = w > 0.0
        plane_y = plane_ref[0, 0]

        # loop-invariant per-vertex constraint count (banded
        # xpbd_constraint_count twin: owned + owning edges and tet corners)
        cnt = jnp.zeros((s_dim, LANES), jnp.float32)
        for gi, (delta, _r, _a) in enumerate(egroups):
            m = em_ref[gi]
            cnt = cnt + m + _flat_roll(m, -delta, s_dim)
        for gi, ((d1, d2, d3), _rv) in enumerate(tgroups):
            m = tm_ref[gi]
            cnt = (cnt + m + _flat_roll(m, -d1, s_dim)
                   + _flat_roll(m, -d2, s_dim) + _flat_roll(m, -d3, s_dim))
        inv_cnt = omega / jnp.maximum(cnt, 1.0)

        # w never changes: hoist every per-group w roll and the edge
        # constraint denominators out of the substep/iteration loops
        # (measured 1.85k -> see docs/PERF.md; they were recomputed
        # n_substeps * n_iterations times).  VMEM cost is accounted in
        # lattice_xpbd_applicable.
        e_wn = []
        e_inv_denom = []
        for gi, (delta, _r, _a) in enumerate(egroups):
            wn = _flat_roll(w, delta, s_dim)
            e_wn.append(wn)
            e_inv_denom.append(
                em_ref[gi] / jnp.maximum(w + wn + alpha_ts[gi], 1e-12)
            )
        t_w = [
            (_flat_roll(w, d1, s_dim), _flat_roll(w, d2, s_dim),
             _flat_roll(w, d3, s_dim))
            for (d1, d2, d3), _rv in tgroups
        ]

        def substep(_, carry):
            x = list(carry[0:3])
            v = list(carry[3:6])
            for c, gc in enumerate(g):
                acc = gc + drag * (wvel[c] - v[c]) * w if drag != 0.0 else gc
                vc = (v[c] + dt * acc) * (1.0 - gdamp * dt)
                v[c] = jnp.where(movable, vc, 0.0)
            xp = [x[c] for c in range(3)]
            dl = [dt * v[c] for c in range(3)]

            def iteration(_, it_carry):
                dl0, dl1, dl2, cf = it_carry[0:4]
                lams = list(it_carry[4:4 + n_e])
                lamv = list(it_carry[4 + n_e:])
                xe = jnp.stack((xp[0] + dl0, xp[1] + dl1, xp[2] + dl2))
                # roll cache: edge and tet-corner deltas overlap heavily
                # (39 rolls/iteration, only ~16 unique on the 5-tet cube)
                xe_rolls = {}

                def xroll(d):
                    if d not in xe_rolls:
                        xe_rolls[d] = _flat_roll(xe, d, s_dim)
                    return xe_rolls[d]

                # reverse-scatter dedup across BOTH constraint families:
                # contributions sharing a reverse delta (9 edge + 30 tet
                # rolls, 17 unique on the 5-tet lattice) are summed before
                # the single roll per delta (rolls are linear)
                pending = {}

                def defer(d, contrib):
                    pending[d] = (pending[d] + contrib) if d in pending \
                        else contrib

                dx = jnp.zeros((3, s_dim, LANES), jnp.float32)
                new_lams = []
                for gi, (delta, rest, _a) in enumerate(egroups):
                    xb = xroll(delta)
                    d = xb - xe
                    d2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
                    inv_len = jax.lax.rsqrt(jnp.maximum(d2, 1e-24))
                    length = d2 * inv_len
                    c_val = length - rest
                    wn = e_wn[gi]
                    dlam = -(c_val + alpha_ts[gi] * lams[gi]) * e_inv_denom[gi]
                    new_lams.append(lams[gi] + dlam)
                    wdl_a = (w * dlam * inv_len)[None]
                    wdl_b = (wn * dlam * inv_len)[None]
                    dx = dx - wdl_a * d
                    defer(delta, wdl_b * d)
                new_lamv = []
                for gi, ((d1, d2_, d3), rest_vol) in enumerate(tgroups):
                    m = tm_ref[gi]
                    p1 = xroll(d1)
                    p2 = xroll(d2_)
                    p3 = xroll(d3)
                    e1 = p1 - xe
                    e2 = p2 - xe
                    e3 = p3 - xe
                    c12 = _cross(e1, e2)
                    g1 = _cross(e2, e3) * (1.0 / 6.0)
                    g2 = _cross(e3, e1) * (1.0 / 6.0)
                    g3 = c12 * (1.0 / 6.0)
                    g0 = -(g1 + g2 + g3)
                    vol = (c12[0] * e3[0] + c12[1] * e3[1] + c12[2] * e3[2]) / 6.0
                    c_v = vol - rest_vol
                    w1, w2, w3 = t_w[gi]
                    denom = (
                        w * (g0[0] * g0[0] + g0[1] * g0[1] + g0[2] * g0[2])
                        + w1 * (g1[0] * g1[0] + g1[1] * g1[1] + g1[2] * g1[2])
                        + w2 * (g2[0] * g2[0] + g2[1] * g2[1] + g2[2] * g2[2])
                        + w3 * (g3[0] * g3[0] + g3[1] * g3[1] + g3[2] * g3[2])
                        + alpha_v
                    )
                    dlam_v = -(c_v + alpha_v * lamv[gi]) / jnp.maximum(
                        denom, 1e-12
                    ) * m
                    new_lamv.append(lamv[gi] + dlam_v)
                    dx = dx + (w * dlam_v)[None] * g0
                    defer(d1, (w1 * dlam_v)[None] * g1)
                    defer(d2_, (w2 * dlam_v)[None] * g2)
                    defer(d3, (w3 * dlam_v)[None] * g3)
                for d, acc in pending.items():
                    dx = dx + _flat_roll(acc, -d, s_dim)
                dl0 = dl0 + dx[0] * inv_cnt
                dl1 = dl1 + dx[1] * inv_cnt
                dl2 = dl2 + dx[2] * inv_cnt
                if plane_on:
                    # the OR of the pre-clamp masks feeds the substep-end
                    # friction (f32 0/1 plane — Mosaic-safe carry)
                    xe1 = xp[1] + dl1
                    contact = (xe1 < plane_y) & movable
                    dl1 = jnp.where(contact, plane_y - xp[1], dl1)
                    cf = jnp.maximum(cf, jnp.where(contact, 1.0, 0.0))
                if spheres_on:
                    xev = [xp[0] + dl0, xp[1] + dl1, xp[2] + dl2]
                    xpr = _project_spheres_positions(
                        list(xev), movable, sph_ref, n_spheres
                    )
                    dl0 = dl0 + (xpr[0] - xev[0])
                    dl1 = dl1 + (xpr[1] - xev[1])
                    dl2 = dl2 + (xpr[2] - xev[2])
                if n_caps_on or n_boxes_on:
                    xev = [xp[0] + dl0, xp[1] + dl1, xp[2] + dl2]
                    xpr = _project_capsules_boxes_smem(
                        list(xev), movable, cap_ref, n_caps_on,
                        box_ref, n_boxes_on,
                    )
                    dl0 = dl0 + (xpr[0] - xev[0])
                    dl1 = dl1 + (xpr[1] - xev[1])
                    dl2 = dl2 + (xpr[2] - xev[2])
                return (dl0, dl1, dl2, cf, *new_lams, *new_lamv)

            zeros = tuple(
                jnp.zeros((s_dim, LANES), jnp.float32)
                for _ in range(n_e + n_t)
            )
            cf0 = jnp.zeros((s_dim, LANES), jnp.float32)
            out = jax.lax.fori_loop(
                0, n_iter, iteration, (dl[0], dl[1], dl[2], cf0, *zeros),
                unroll=1
            )
            dlf = [jnp.where(movable, out[c], 0.0) for c in range(3)]
            if plane_on and mu != 0.0:
                # plane friction ONCE per substep at the OR'd pre-clamp
                # contact mask (stencil xpbd twin, delta form)
                fric = out[3] > 0.0
                for ax in (0, 2):
                    wdt = plane_ref[0, 1 + ax] * dt
                    dlf[ax] = jnp.where(
                        fric, wdt + (dlf[ax] - wdt) * (1.0 - mu), dlf[ax]
                    )
            if spheres_on and mu != 0.0:
                from .pallas_substep import _sphere_friction_positions

                xev = [xp[c] + dlf[c] for c in range(3)]
                xfr = _sphere_friction_positions(
                    list(xev), xp, movable, sph_ref, n_spheres, mu, dt
                )
                dlf = [dlf[c] + (xfr[c] - xev[c]) for c in range(3)]
            if (n_caps_on or n_boxes_on) and mu != 0.0:
                from .pallas_substep import _rest_friction_smem

                xev = [xp[c] + dlf[c] for c in range(3)]
                xfr = _rest_friction_smem(
                    list(xev), xp, movable, cap_ref, n_caps_on, box_ref,
                    n_boxes_on, mu, dt
                )
                dlf = [dlf[c] + (xfr[c] - xev[c]) for c in range(3)]
            x = [xp[c] + dlf[c] for c in range(3)]
            v = [dlf[c] * (1.0 / dt) for c in range(3)]
            return (x[0], x[1], x[2], v[0], v[1], v[2])

        init = (
            x_ref[0], x_ref[1], x_ref[2],
            v_ref[0], v_ref[1], v_ref[2],
        )
        out = jax.lax.fori_loop(0, n_substeps, substep, init, unroll=1)
        xo_ref[0], xo_ref[1], xo_ref[2] = out[0], out[1], out[2]
        vo_ref[0], vo_ref[1], vo_ref[2] = out[3], out[4], out[5]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "egroups", "tgroups", "dt", "n_substeps", "interpret"),
)
def _pallas_lattice_xpbd_substeps(x3, v3, im2, emask, tmask, plane_h, spheres,
                                  capsules, boxes,
                                  cfg, egroups, tgroups, dt, n_substeps,
                                  interpret=False):
    s_dim = x3.shape[-2]
    n_spheres = spheres.shape[0]
    n_capsules = capsules.shape[0]
    n_boxes = boxes.shape[0]
    kernel = _make_xpbd_kernel(cfg, egroups, tgroups, s_dim, dt, n_substeps,
                               n_spheres, n_capsules, n_boxes)
    sph = spheres if n_spheres > 0 else jnp.zeros((1, 7), jnp.float32)
    capsules = capsules if n_capsules > 0 else jnp.zeros((1, 10), jnp.float32)
    boxes = boxes if n_boxes > 0 else jnp.zeros((1, 18), jnp.float32)
    n_el = s_dim * LANES
    xo, vo = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((3, s_dim, LANES), jnp.float32),
            jax.ShapeDtypeStruct((3, s_dim, LANES), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, 4), memory_space=pltpu.SMEM),
            pl.BlockSpec(sph.shape, memory_space=pltpu.SMEM),
            pl.BlockSpec(capsules.shape, memory_space=pltpu.SMEM),
            pl.BlockSpec(boxes.shape, memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_substeps * cfg.xpbd.n_iterations * 3 * n_el
            * (len(egroups) * 30 + len(tgroups) * 70),
            bytes_accessed=4 * 3 * n_el * 4 + (emask.size + tmask.size) * 4,
            transcendentals=n_substeps * cfg.xpbd.n_iterations * n_el
            * len(egroups),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(plane_h.reshape(1, 4), sph, capsules, boxes, x3, v3, im2, emask, tmask)
    return xo, vo


def make_lattice_xpbd_step(top: Topology, cfg: SimConfig,
                           interpret: bool = False):
    """Build ``fn(state, dt, n_substeps) -> state`` for the fused XPBD
    lattice kernel.  Callers gate on :func:`lattice_xpbd_applicable`."""
    g = top.offset_groups
    t = top.tet_groups
    egroups = tuple(
        (delta, rest, alpha)
        for delta, (_k, rest, alpha) in zip(g.deltas, g.uniform)
    )
    tgroups = tuple(
        (pattern, rv)
        for pattern, rv in zip(t.deltas, t.uniform_rest_volume)
    )
    n = top.n_vertices
    s_dim = pl.cdiv(n, LANES)

    def fn(state: State, dt: float, n_substeps: int) -> State:
        x3 = _fold(state.x.T, s_dim)
        v3 = _fold(state.v.T, s_dim)
        im2 = _fold(top.inv_mass, s_dim)
        emask = _fold(g.mask, s_dim)
        tmask = (_fold(t.mask, s_dim) if len(t.deltas) > 0
                 else jnp.zeros((1, s_dim, LANES), jnp.float32))
        spheres = _pack_spheres(top)
        xo, vo = _pallas_lattice_xpbd_substeps(
            x3, v3, im2, emask, tmask, _pack_plane(top), spheres,
            _pack_capsules(top), _pack_boxes(top),
            cfg, egroups, tgroups, float(dt), int(n_substeps), interpret,
        )
        x = xo.reshape(3, -1).T[:n]
        v = vo.reshape(3, -1).T[:n]
        # preserve dormant per-edge feature state (tearing/plasticity
        # are config-gated off on this path but the arrays persist)
        return State(x=x, v=v, x_prev=x - dt * v,
                     edge_alive=state.edge_alive,
                     rest_scale=state.rest_scale)

    return fn


def _make_verlet_kernel(cfg: SimConfig, egroups, tgroups, s_dim: int,
                        dt: float, n_substeps: int, n_spheres: int,
                        n_capsules: int = 0, n_boxes: int = 0):
    """Verlet variant of the fused lattice kernel: carries (x, x_prev),
    damped position update, banded volume projection, position-only
    contact projection.  Twin: solver/step.py substep_verlet on the
    banded path."""
    g = cfg.gravity
    damping = cfg.springs.damping
    gdamp = cfg.global_damping
    plane_on = cfg.collision.enable_plane
    spheres_on = cfg.collision.enable_spheres and n_spheres > 0
    n_caps_on = n_capsules if cfg.collision.enable_capsules else 0
    n_boxes_on = n_boxes if cfg.collision.enable_boxes else 0
    drag = cfg.wind.drag
    wvel = cfg.wind.velocity
    vol_stiff = cfg.volume_stiffness
    use_volume = len(tgroups) > 0 and vol_stiff != 0.0
    mu = cfg.collision.friction
    inv_dt = 1.0 / dt

    def kernel(plane_ref, sph_ref, cap_ref, box_ref, x_ref, xp_ref, im_ref,
               em_ref, tm_ref, xo_ref, xpo_ref):
        im = im_ref[:]
        movable = im > 0.0
        plane_y = plane_ref[0, 0]
        if use_volume:
            inv_cnt_vs, t_w = _hoist_tet_invariants(
                tm_ref, im, tgroups, s_dim, vol_stiff
            )

        def substep(_, carry):
            x0, x1, x2, p0, p1, p2 = carry
            xs = jnp.stack((x0, x1, x2))
            ps = (p0, p1, p2)
            v_est = [(xs[c] - ps[c]) * inv_dt for c in range(3)]
            f = _spring_forces_planes(
                xs, jnp.stack(v_est), egroups, em_ref, damping, s_dim
            )
            xz = []
            for c, gc in enumerate(g):
                fc = f[c]
                if drag != 0.0:   # isotropic wind drag (lift gated off)
                    fc = fc + drag * (wvel[c] - v_est[c])
                accel = gc + fc * im
                xn = (xs[c] + (xs[c] - ps[c]) * (1.0 - gdamp * dt)
                      + accel * (dt * dt))
                xz.append(jnp.where(movable, xn, xs[c]))
            if use_volume:
                dxs = _volume_dx(jnp.stack(xz), tgroups, tm_ref, t_w, im,
                                 s_dim)
                for c in range(3):
                    xz[c] = xz[c] + jnp.where(
                        movable, dxs[c] * inv_cnt_vs, 0.0
                    )
            # position-only collide (solver/collide.py
            # project_positions_only twin)
            if plane_on:
                contact = (xz[1] < plane_y) & movable
                xz[1] = jnp.where(contact, plane_y, xz[1])
            if spheres_on:
                xz = _project_spheres_positions(
                    xz, movable, sph_ref, n_spheres
                )
            if n_caps_on or n_boxes_on:
                xz = _project_capsules_boxes_smem(
                    xz, movable, cap_ref, n_caps_on, box_ref, n_boxes_on
                )
            if plane_on and mu != 0.0:
                # substep-end plane friction at the pre-clamp contact mask
                # (collide.plane_friction_positions twin)
                for ax in (0, 2):
                    target = xs[ax] + plane_ref[0, 1 + ax] * dt
                    xz[ax] = jnp.where(
                        contact, target + (xz[ax] - target) * (1.0 - mu),
                        xz[ax],
                    )
            if spheres_on and mu != 0.0:
                from .pallas_substep import _sphere_friction_positions

                xz = _sphere_friction_positions(
                    xz, [xs[c] for c in range(3)], movable, sph_ref,
                    n_spheres, mu, dt
                )
            if (n_caps_on or n_boxes_on) and mu != 0.0:
                from .pallas_substep import _rest_friction_smem

                xz = _rest_friction_smem(
                    xz, [xs[c] for c in range(3)], movable, cap_ref,
                    n_caps_on, box_ref, n_boxes_on, mu, dt
                )
            return (xz[0], xz[1], xz[2], x0, x1, x2)

        init = (
            x_ref[0], x_ref[1], x_ref[2],
            xp_ref[0], xp_ref[1], xp_ref[2],
        )
        # unroll=1: Mosaic otherwise unrolls static trip counts and the
        # per-iteration stack allocations exceed the 16M VMEM scope
        out = jax.lax.fori_loop(0, n_substeps, substep, init, unroll=1)
        xo_ref[0], xo_ref[1], xo_ref[2] = out[0], out[1], out[2]
        xpo_ref[0], xpo_ref[1], xpo_ref[2] = out[3], out[4], out[5]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "egroups", "tgroups", "dt", "n_substeps", "interpret"),
)
def _pallas_lattice_verlet_substeps(x3, xp3, im2, emask, tmask, plane_h,
                                    spheres, capsules, boxes,
                                    cfg, egroups, tgroups, dt, n_substeps,
                                    interpret=False):
    s_dim = x3.shape[-2]
    n_spheres = spheres.shape[0]
    n_capsules = capsules.shape[0]
    n_boxes = boxes.shape[0]
    kernel = _make_verlet_kernel(cfg, egroups, tgroups, s_dim, dt,
                                 n_substeps, n_spheres, n_capsules, n_boxes)
    sph = spheres if n_spheres > 0 else jnp.zeros((1, 7), jnp.float32)
    capsules = capsules if n_capsules > 0 else jnp.zeros((1, 10), jnp.float32)
    boxes = boxes if n_boxes > 0 else jnp.zeros((1, 18), jnp.float32)
    n_el = s_dim * LANES
    flops_per_sub = 3 * n_el * (len(egroups) * 30 + len(tgroups) * 70)
    xo, xpo = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((3, s_dim, LANES), jnp.float32),
            jax.ShapeDtypeStruct((3, s_dim, LANES), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, 4), memory_space=pltpu.SMEM),
            pl.BlockSpec(sph.shape, memory_space=pltpu.SMEM),
            pl.BlockSpec(capsules.shape, memory_space=pltpu.SMEM),
            pl.BlockSpec(boxes.shape, memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_substeps * flops_per_sub,
            bytes_accessed=4 * 3 * n_el * 4 + (emask.size + tmask.size) * 4,
            transcendentals=n_substeps * n_el * len(egroups),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(plane_h.reshape(1, 4), sph, capsules, boxes, x3, xp3, im2, emask, tmask)
    return xo, xpo


def make_lattice_verlet_step(top: Topology, cfg: SimConfig,
                             interpret: bool = False):
    """Build ``fn(state, dt, n_substeps) -> state`` for the fused Verlet
    lattice kernel.  Callers gate on :func:`lattice_verlet_applicable`."""
    g = top.offset_groups
    t = top.tet_groups
    egroups = tuple(
        (delta, k, rest)
        for delta, (k, rest, _alpha) in zip(g.deltas, g.uniform)
    )
    use_volume = len(t.deltas) > 0 and cfg.volume_stiffness != 0.0
    tgroups = tuple(
        (pattern, rv)
        for pattern, rv in zip(t.deltas, t.uniform_rest_volume)
    ) if use_volume else ()
    n = top.n_vertices
    s_dim = pl.cdiv(n, LANES)

    def fn(state: State, dt: float, n_substeps: int) -> State:
        x3 = _fold(state.x.T, s_dim)
        xp3 = _fold(state.x_prev.T, s_dim)
        im2 = _fold(top.inv_mass, s_dim)
        emask = _fold(g.mask, s_dim)
        tmask = (_fold(t.mask, s_dim) if use_volume
                 else jnp.zeros((1, s_dim, LANES), jnp.float32))
        spheres = _pack_spheres(top)
        xo, xpo = _pallas_lattice_verlet_substeps(
            x3, xp3, im2, emask, tmask, _pack_plane(top), spheres,
            _pack_capsules(top), _pack_boxes(top),
            cfg, egroups, tgroups, float(dt), int(n_substeps), interpret,
        )
        x = xo.reshape(3, -1).T[:n]
        xp = xpo.reshape(3, -1).T[:n]
        # preserve dormant per-edge feature state (tearing/plasticity
        # are config-gated off on this path but the arrays persist)
        return State(x=x, v=(x - xp) / dt, x_prev=xp,
                     edge_alive=state.edge_alive,
                     rest_scale=state.rest_scale)

    return fn


def make_lattice_step(top: Topology, cfg: SimConfig, interpret: bool = False):
    """Build ``fn(state, dt, n_substeps) -> state`` running the fused
    lattice kernel.  Callers must gate on :func:`lattice_applicable`."""
    g = top.offset_groups
    t = top.tet_groups
    egroups = tuple(
        (delta, k, rest)
        for delta, (k, rest, _alpha) in zip(g.deltas, g.uniform)
    )
    use_volume = len(t.deltas) > 0 and cfg.volume_stiffness != 0.0
    tgroups = tuple(
        (pattern, rv)
        for pattern, rv in zip(t.deltas, t.uniform_rest_volume)
    ) if use_volume else ()
    n = top.n_vertices
    s_dim = pl.cdiv(n, LANES)

    def fn(state: State, dt: float, n_substeps: int) -> State:
        x3 = _fold(state.x.T, s_dim)
        v3 = _fold(state.v.T, s_dim)
        im2 = _fold(top.inv_mass, s_dim)
        emask = _fold(g.mask, s_dim)
        tmask = (_fold(t.mask, s_dim) if use_volume
                 else jnp.zeros((1, s_dim, LANES), jnp.float32))
        spheres = _pack_spheres(top)
        xo, vo = _pallas_lattice_substeps(
            x3, v3, im2, emask, tmask, _pack_plane(top), spheres,
            _pack_capsules(top), _pack_boxes(top),
            cfg, egroups, tgroups, float(dt), int(n_substeps), interpret,
        )
        x = xo.reshape(3, -1).T[:n]
        v = vo.reshape(3, -1).T[:n]
        # preserve dormant per-edge feature state (tearing/plasticity
        # are config-gated off on this path but the arrays persist)
        return State(x=x, v=v, x_prev=x - dt * v,
                     edge_alive=state.edge_alive,
                     rest_scale=state.rest_scale)

    return fn


def lattice_shapematch_applicable(top: Topology, cfg: SimConfig) -> bool:
    """Static gate for the HYBRID shape-matched lattice step: the fused
    lattice kernel runs the integrate+volume stage one substep at a time
    with in-kernel contact disabled, then the MXU one-hot shape matching
    and the jnp contact resolve run outside — preserving the oracle's
    integrate -> shape-match -> collide order.  Euler/Verlet only; any
    per-edge feature state (tearing/plasticity/strain limiting) or
    pressure routes to the general jnp path instead."""
    if not (cfg.shape_match.enabled and top.n_clusters > 0):
        return False
    if (cfg.strain_limit.enabled or cfg.plasticity.enabled
            or cfg.tear.enabled
            or (cfg.pressure.enabled and top.n_pressure_bodies > 0)):
        return False
    if top.n_tets == 0:
        return False
    if cfg.solver not in (Solver.SEMI_IMPLICIT_EULER, Solver.VERLET):
        return False
    return _lattice_gate_common(top, cfg, cfg.solver)


def _euler_contact_flat(cfg, xz, vz, movable, plane4, sph, caps, boxes,
                        n_spheres, n_caps, n_boxes):
    """Velocity-level contact resolve on flat component rows (mirror of
    the in-kernel block in :func:`_make_kernel`; pure jnp, runs OUTSIDE
    the kernel in the shape-match hybrid where contact must follow the
    shape matching).  ``xz``/``vz`` are length-3 lists of ``f32[S*128]``
    rows."""
    restitution = cfg.collision.restitution
    friction = cfg.collision.friction
    if cfg.collision.enable_plane:
        plane_y = plane4[0, 0]
        wp = [plane4[0, 1 + c] for c in range(3)]
        contact = (xz[1] < plane_y) & movable
        xz[1] = jnp.where(contact, plane_y, xz[1])
        uy = vz[1] - wp[1]
        vz[1] = jnp.where(
            contact,
            jnp.where(uy < 0.0, wp[1] - restitution * uy, vz[1]), vz[1]
        )
        fr = 1.0 - friction
        vz[0] = jnp.where(contact, wp[0] + (vz[0] - wp[0]) * fr, vz[0])
        vz[2] = jnp.where(contact, wp[2] + (vz[2] - wp[2]) * fr, vz[2])
    if n_spheres:
        xz, vz = _resolve_spheres_velocity(
            xz, vz, movable, sph, n_spheres, restitution, friction
        )
    if n_caps or n_boxes:
        xz, vz = _resolve_capsules_boxes_smem(
            xz, vz, movable, caps, n_caps, boxes, n_boxes,
            restitution, friction,
        )
    return xz, vz


def _verlet_contact_flat(cfg, xz, xsz, movable, dt, plane4, sph, caps,
                         boxes, n_spheres, n_caps, n_boxes):
    """Position-projection contact on flat component rows (mirror of the
    in-kernel block in :func:`_make_verlet_kernel`): clamp + substep-end
    position friction against ``xsz`` (substep-start rows)."""
    from .pallas_substep import (
        _rest_friction_smem,
        _sphere_friction_positions,
    )

    mu = cfg.collision.friction
    contact = None
    if cfg.collision.enable_plane:
        plane_y = plane4[0, 0]
        contact = (xz[1] < plane_y) & movable
        xz[1] = jnp.where(contact, plane_y, xz[1])
    if n_spheres:
        xz = _project_spheres_positions(xz, movable, sph, n_spheres)
    if n_caps or n_boxes:
        xz = _project_capsules_boxes_smem(
            xz, movable, caps, n_caps, boxes, n_boxes
        )
    if cfg.collision.enable_plane and mu != 0.0:
        for ax in (0, 2):
            target = xsz[ax] + plane4[0, 1 + ax] * dt
            xz[ax] = jnp.where(
                contact, target + (xz[ax] - target) * (1.0 - mu), xz[ax]
            )
    if n_spheres and mu != 0.0:
        xz = _sphere_friction_positions(
            xz, xsz, movable, sph, n_spheres, mu, dt
        )
    if (n_caps or n_boxes) and mu != 0.0:
        xz = _rest_friction_smem(
            xz, xsz, movable, caps, n_caps, boxes, n_boxes, mu, dt
        )
    return xz


def make_lattice_shapematch_step(top: Topology, cfg: SimConfig,
                                 interpret: bool = False):
    """Build ``fn(state, dt, n_substeps) -> state`` for shape-matched
    lattices (jelly bodies): per substep, ONE fused-kernel launch
    (banded springs + integrate + volume projection, contact gated OFF
    inside the kernel) feeds the MXU one-hot shape matching
    (solver/shapematch.py) and the jnp contact resolve — all under one
    ``lax.scan``, so the frame is still a single XLA program.  Callers
    gate on :func:`lattice_shapematch_applicable`.  Semantics ==
    solver/step.py::substep_euler / substep_verlet with shape matching
    (oracle order: integrate -> shape-match -> collide, contact wins).

    The scan carries the kernel's OWN ``[3, S, 128]`` plane layout and
    the shape matching + contact run on flat ``[3, S*128]`` component
    rows (free bitcasts of the planes): the per-substep ``[N, 3]``
    fold/unfold transposes of the first hybrid are gone, elementwise
    work runs full-lane, and the frame folds/unfolds exactly once.
    Scenes whose padded one-hot outgrows
    ``shapematch.MXU_ONEHOT_MAX_ELEMS`` keep the vertex-layout body
    (segment_sum reductions)."""
    from ..solver import collide
    from ..solver.shapematch import (
        MXU_ONEHOT_MAX_ELEMS,
        shape_match_dx,
        shape_match_dx_flat,
        shape_match_dx_kron,
        shape_match_flat_statics,
        shape_match_kron_statics,
    )
    from ..solver.step import verlet_contact_project

    g = top.offset_groups
    t = top.tet_groups
    egroups = tuple(
        (delta, k, rest)
        for delta, (k, rest, _alpha) in zip(g.deltas, g.uniform)
    )
    use_volume = len(t.deltas) > 0 and cfg.volume_stiffness != 0.0
    tgroups = tuple(
        (pattern, rv)
        for pattern, rv in zip(t.deltas, t.uniform_rest_volume)
    ) if use_volume else ()
    n = top.n_vertices
    s_dim = pl.cdiv(n, LANES)
    # contact moves OUTSIDE the kernel (after shape matching)
    cfg_nc = cfg.replace(collision=dataclasses.replace(
        cfg.collision, enable_plane=False, enable_spheres=False,
        enable_capsules=False, enable_boxes=False,
    ))
    verlet = cfg.solver == Solver.VERLET

    npad = s_dim * LANES
    # reduction backend, best first: Kronecker per-axis factors (raster
    # lattices with spatial cells — near-zero one-hot traffic), dense
    # [N, K] one-hot MXU matmuls, vertex-layout segment_sum fallback
    kron = shape_match_kron_statics(top)
    flat_oh = (kron is None
               and npad * int(top.n_clusters) <= MXU_ONEHOT_MAX_ELEMS)
    n_spheres = (top.n_spheres if cfg.collision.enable_spheres else 0)
    n_caps = (top.n_capsules if cfg.collision.enable_capsules else 0)
    n_boxes = (top.n_boxes if cfg.collision.enable_boxes else 0)

    def fn(state: State, dt: float, n_substeps: int) -> State:
        if state.cluster_quat is None:
            # dormant shape matching (api.ensure_shapematch_state not
            # called): identical to the plain lattice kernels
            make = (make_lattice_verlet_step if verlet
                    else make_lattice_step)
            return make(top, cfg, interpret=interpret)(state, dt,
                                                       n_substeps)
        movable = top.inv_mass > 0.0
        im2 = _fold(top.inv_mass, s_dim)
        emask = _fold(g.mask, s_dim)
        tmask = (_fold(t.mask, s_dim) if use_volume
                 else jnp.zeros((1, s_dim, LANES), jnp.float32))
        plane = _pack_plane(top)
        spheres = _pack_spheres(top)
        capsules = _pack_capsules(top)
        boxes = _pack_boxes(top)
        dt_f = float(dt)

        if kron is not None or flat_oh:
            # plane-layout scan: the carries ARE the kernel's planes
            smd = (kron if kron is not None
                   else shape_match_flat_statics(top, s_dim, LANES))
            mov_f = im2.reshape(-1) > 0.0

            def sm_apply(xf, quats, x0):
                # x0: warm global-centroid carry of the kron path (the
                # single-pass reduce conditions on it; one-substep lag
                # is irrelevant — see shape_match_dx_kron)
                if kron is not None:
                    dxn, quats, x0 = shape_match_dx_kron(
                        cfg, smd, xf[:, :n], quats, x0)
                    return (jnp.pad(dxn, ((0, 0), (0, npad - n))), quats,
                            x0)
                dxf, quats = shape_match_dx_flat(cfg, smd, xf, quats)
                return dxf, quats, x0

            def euler_body_planes(carry, _):
                x3, v3, quats, x0 = carry
                xo, vo = _pallas_lattice_substeps(
                    x3, v3, im2, emask, tmask, plane, spheres, capsules,
                    boxes, cfg_nc, egroups, tgroups, dt_f, 1, interpret,
                )
                xf = xo.reshape(3, -1)
                vf = vo.reshape(3, -1)
                dxf, quats, x0 = sm_apply(xf, quats, x0)
                xf = xf + dxf
                vf = vf + dxf * (1.0 / dt_f)
                xz = [xf[0], xf[1], xf[2]]
                vz = [vf[0], vf[1], vf[2]]
                xz, vz = _euler_contact_flat(
                    cfg, xz, vz, mov_f, plane, spheres, capsules, boxes,
                    n_spheres, n_caps, n_boxes,
                )
                return (jnp.stack(xz).reshape(3, s_dim, LANES),
                        jnp.stack(vz).reshape(3, s_dim, LANES), quats,
                        x0), None

            def verlet_body_planes(carry, _):
                x3, xp3, quats, x0 = carry
                xo, xpo = _pallas_lattice_verlet_substeps(
                    x3, xp3, im2, emask, tmask, plane, spheres, capsules,
                    boxes, cfg_nc, egroups, tgroups, dt_f, 1, interpret,
                )
                xf = xo.reshape(3, -1)
                xsf = xpo.reshape(3, -1)      # substep-start positions
                dxf, quats, x0 = sm_apply(xf, quats, x0)
                xf = xf + dxf                 # position-only (oracle
                xz = [xf[0], xf[1], xf[2]]    # substep_verlet)
                xsz = [xsf[0], xsf[1], xsf[2]]
                xz = _verlet_contact_flat(
                    cfg, xz, xsz, mov_f, dt_f, plane, spheres, capsules,
                    boxes, n_spheres, n_caps, n_boxes,
                )
                return (jnp.stack(xz).reshape(3, s_dim, LANES),
                        xpo, quats, x0), None

            x3 = _fold(state.x.T, s_dim)
            # bootstrap the warm-centroid carry once per step call (the
            # in-scan updates ride the [K]-sized reduce outputs)
            if kron is not None:
                xflat = x3.reshape(3, -1)[:, :n]
                x00 = (jnp.sum(smd["m"][None] * xflat, axis=1,
                               keepdims=True) * smd["inv_mass_total"])
            else:
                x00 = jnp.zeros((3, 1), jnp.float32)
            if verlet:
                xp3 = _fold(state.x_prev.T, s_dim)
                (x3, xp3, quats, _), _ = jax.lax.scan(
                    verlet_body_planes,
                    (x3, xp3, state.cluster_quat, x00),
                    None, length=int(n_substeps))
                x = x3.reshape(3, -1).T[:n]
                xp = xp3.reshape(3, -1).T[:n]
                return State(x=x, v=(x - xp) / dt_f, x_prev=xp,
                             edge_alive=state.edge_alive,
                             rest_scale=state.rest_scale,
                             cluster_quat=quats)
            v3 = _fold(state.v.T, s_dim)
            (x3, v3, quats, _), _ = jax.lax.scan(
                euler_body_planes, (x3, v3, state.cluster_quat, x00),
                None, length=int(n_substeps))
            x = x3.reshape(3, -1).T[:n]
            v = v3.reshape(3, -1).T[:n]
            return State(x=x, v=v, x_prev=x - dt_f * v,
                         edge_alive=state.edge_alive,
                         rest_scale=state.rest_scale, cluster_quat=quats)

        def euler_body(carry, _):
            x, v, quats = carry
            xo, vo = _pallas_lattice_substeps(
                _fold(x.T, s_dim), _fold(v.T, s_dim), im2, emask, tmask,
                plane, spheres, capsules, boxes,
                cfg_nc, egroups, tgroups, dt_f, 1, interpret,
            )
            x = xo.reshape(3, -1).T[:n]
            v = vo.reshape(3, -1).T[:n]
            dxs, quats = shape_match_dx(top, cfg, x, quats)
            x = x + dxs
            v = v + dxs / dt_f
            x, v = collide.resolve_velocity_level(top, cfg, x, v, movable)
            return (x, v, quats), None

        def verlet_body(carry, _):
            x, xp, quats = carry
            xo, _ = _pallas_lattice_verlet_substeps(
                _fold(x.T, s_dim), _fold(xp.T, s_dim), im2, emask, tmask,
                plane, spheres, capsules, boxes,
                cfg_nc, egroups, tgroups, dt_f, 1, interpret,
            )
            x_new = xo.reshape(3, -1).T[:n]
            # position-only on the projection solvers (oracle
            # substep_verlet)
            dxs, quats = shape_match_dx(top, cfg, x_new, quats)
            x_new = x_new + dxs
            x_new = verlet_contact_project(top, cfg, x_new, x, dt_f,
                                           movable)
            return (x_new, x, quats), None

        if verlet:
            (x, xp, quats), _ = jax.lax.scan(
                verlet_body, (state.x, state.x_prev, state.cluster_quat),
                None, length=int(n_substeps))
            return State(x=x, v=(x - xp) / dt_f, x_prev=xp,
                         edge_alive=state.edge_alive,
                         rest_scale=state.rest_scale, cluster_quat=quats)
        (x, v, quats), _ = jax.lax.scan(
            euler_body, (state.x, state.v, state.cluster_quat),
            None, length=int(n_substeps))
        return State(x=x, v=v, x_prev=x - dt_f * v,
                     edge_alive=state.edge_alive,
                     rest_scale=state.rest_scale, cluster_quat=quats)

    return fn
