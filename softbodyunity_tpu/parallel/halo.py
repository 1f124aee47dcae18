"""Spatial domain decomposition of one large cloth across TPU chips
(SURVEY.md C16) — the sequence/context-parallel analogue.

One huge ``ny x nx`` cloth grid is sharded by *rows* over a 1-D device mesh
with ``shard_map``.  Each substep, every chip exchanges a 2-row halo (the
bend-spring reach) with its mesh neighbours via ``lax.ppermute`` — the same
ring-neighbour ICI communication pattern as ring attention (SURVEY.md §5
"Long-context / sequence parallelism") — then runs the stencil substep on
its extended local block and keeps the interior.

Correctness argument (tests assert equality with the single-device stencil
path): all spring offsets point "down/right" ((0,1),(1,0),(1,1),(1,-1),
(0,2),(2,0)), so an edge is *owned* by its upper vertex.  With a 2-row halo
above and below, (i) interior vertices see correct neighbour positions for
owned edges, and (ii) reaction forces from edges owned by the 2 halo rows
above are recovered by the ``-offset`` shift.  Validity at global boundaries
is decided by global row index (``axis_index``-derived iota masks), so halo
zero-padding never fabricates springs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import SimConfig
from ..core.state import State
from ..core.topology import EDGE_BEND, EDGE_SHEAR, Topology
from ..kernels import stencil as st

ROWS_AXIS = "rows"
HALO = 2  # bend springs reach 2 rows


def _exchange_halo(a: jax.Array, axis_name: str) -> jax.Array:
    """[3, h, nx] local block -> [3, h + 2*HALO, nx] with neighbour rows.

    Non-periodic: the first/last device's outer halo stays zero (masked out
    by the global-row validity masks).
    """
    n_dev = jax.lax.axis_size(axis_name)
    # my bottom rows -> next device's top halo
    down_perm = [(i, i + 1) for i in range(n_dev - 1)]
    up_perm = [(i + 1, i) for i in range(n_dev - 1)]
    from_above = jax.lax.ppermute(a[:, -HALO:, :], axis_name, down_perm)
    from_below = jax.lax.ppermute(a[:, :HALO, :], axis_name, up_perm)
    return jnp.concatenate([from_above, a, from_below], axis=1)


def _owned_mask_ext(ny_local: int, nx: int, ny_global: int, di: int, dj: int,
                    dev_idx) -> jax.Array:
    """Validity of owned edge (di, dj) for each vertex of the *extended*
    block (rows include the 2-row halos), judged by global coordinates."""
    ext = ny_local + 2 * HALO
    local_rows = jax.lax.broadcasted_iota(jnp.int32, (ext, nx), 0) - HALO
    g_rows = dev_idx * ny_local + local_rows
    cols = jax.lax.broadcasted_iota(jnp.int32, (ext, nx), 1)
    row_ok = (g_rows >= 0) & (g_rows + di >= 0) & (g_rows + di <= ny_global - 1) & (
        g_rows <= ny_global - 1
    )
    col_ok = (cols + dj >= 0) & (cols + dj <= nx - 1)
    return (row_ok & col_ok).astype(jnp.float32)


def _halo_substep(x3, v3, inv_mass_ext_builder, offsets, cfg, dt,
                  plane_height, ny_global, axis_name, spheres=None):
    """One Euler substep on a row-sharded block (inside shard_map)."""
    ny_local, nx = x3.shape[-2], x3.shape[-1]
    dev = jax.lax.axis_index(axis_name)

    xe = _exchange_halo(x3, axis_name)
    ve = _exchange_halo(v3, axis_name)

    f = jnp.zeros_like(xe)
    for di, dj, k, rest in offsets:
        xn = st._shift(xe, di, dj)
        vn = st._shift(ve, di, dj)
        d = xn - xe
        length = jnp.sqrt(jnp.sum(d * d, axis=0))
        inv_len = 1.0 / jnp.maximum(length, 1e-12)
        n = d * inv_len
        rel_v = jnp.sum((vn - ve) * n, axis=0)
        mask = _owned_mask_ext(ny_local, nx, ny_global, di, dj, dev)
        fmag = (k * (length - rest) + cfg.springs.damping * rel_v) * mask
        fo = fmag * n
        f = f + fo - st._shift(fo, -di, -dj)
    f = f[:, HALO : HALO + ny_local, :]

    inv_mass2 = inv_mass_ext_builder
    movable = inv_mass2 > 0.0
    g = jnp.asarray(cfg.gravity).astype(x3.dtype).reshape(3, 1, 1)
    v3 = (v3 + dt * (g + f * inv_mass2)) * (1.0 - cfg.global_damping * dt)
    v3 = jnp.where(movable, v3, 0.0)
    x3 = x3 + dt * v3
    x3, v3 = _resolve_colliders(x3, v3, movable, cfg, plane_height, spheres)
    return x3, v3


def _resolve_colliders(x3, v3, movable, cfg, plane_height, spheres):
    """Velocity-level plane/sphere resolve on plane-layout blocks (the
    collider geometry is global, so sharding needs no special handling)."""
    if cfg.collision.enable_plane:
        contact = (x3[1] < plane_height) & movable[0]
        x3 = x3.at[1].set(jnp.where(contact, plane_height, x3[1]))
        vy = v3[1]
        vy = jnp.where(contact, jnp.where(vy < 0.0, -cfg.collision.restitution * vy, vy), vy)
        fr = 1.0 - cfg.collision.friction
        v3 = jnp.stack(
            [jnp.where(contact, v3[0] * fr, v3[0]), vy,
             jnp.where(contact, v3[2] * fr, v3[2])]
        )
    if cfg.collision.enable_spheres and spheres is not None:
        centers, radii = spheres
        for si in range(radii.shape[0]):
            c = centers[si].reshape(3, 1, 1)
            d = x3 - c
            dist = jnp.sqrt(jnp.sum(d * d, axis=0))
            pen = radii[si] - dist
            contact = (pen > 0.0) & movable[0]
            n = d / jnp.maximum(dist, 1e-12)
            x3 = x3 + jnp.where(contact, pen, 0.0) * n
            vn = jnp.sum(v3 * n, axis=0)
            inward = contact & (vn < 0.0)
            v3 = v3 - jnp.where(inward, (1.0 + cfg.collision.restitution) * vn, 0.0) * n
            vn2 = jnp.sum(v3 * n, axis=0) * n
            vt = v3 - vn2
            v3 = jnp.where(contact, vn2 + vt * (1.0 - cfg.collision.friction), v3)
    return x3, v3


def make_halo_step(top: Topology, cfg: SimConfig, mesh: Mesh):
    """Build a jittable row-sharded stepping function (semi-implicit Euler).

    Returns ``fn(x3, v3, inv_mass3, plane_height, dt, n_substeps)`` operating
    on plane-layout arrays ``f32[3, ny, nx]`` sharded ``P(None, ROWS_AXIS,
    None)``; use :func:`shard_grid_state` to produce them from a ``State``.
    Sphere colliders are supported (geometry replicated — it is global).
    """
    ny, nx = top.grid_shape
    spheres_on = cfg.collision.enable_spheres and top.n_spheres > 0
    n_dev = mesh.shape[ROWS_AXIS]
    assert ny % n_dev == 0, f"ny={ny} must divide over {n_dev} devices"
    has_shear = EDGE_SHEAR in top.edge_classes_present
    has_bend = EDGE_BEND in top.edge_classes_present
    offsets = st._offsets(cfg, top.grid_spacing, has_shear, has_bend)

    spec = P(None, ROWS_AXIS, None)

    def sharded_steps(x3, v3, inv_mass3, plane_height, dt, n_substeps,
                      sphere_centers=None, sphere_radii=None):
        # sphere geometry arrives as replicated shard_map INPUTS, never jit
        # closure constants (trace-time value fetches stall on this image)
        def local(x3b, v3b, imb, ph, *sph):
            spheres = (sph[0], sph[1]) if sph else None

            def body(carry, _):
                xb, vb = carry
                xb, vb = _halo_substep(
                    xb, vb, imb, offsets, cfg, dt, ph[0], ny, ROWS_AXIS,
                    spheres=spheres,
                )
                return (xb, vb), None

            (xf, vf), _ = jax.lax.scan(body, (x3b, v3b), None, length=n_substeps)
            return xf, vf

        if spheres_on:
            if sphere_centers is None:
                raise ValueError(
                    "cfg enables spheres: pass sphere_centers/sphere_radii "
                    "(e.g. top.sphere_centers, top.sphere_radii)"
                )
            return jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(spec, spec, spec, P(), P(), P()),
                out_specs=(spec, spec),
            )(x3, v3, inv_mass3, plane_height, sphere_centers, sphere_radii)
        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(spec, spec, spec, P()),
            out_specs=(spec, spec),
        )(x3, v3, inv_mass3, plane_height)

    return sharded_steps


def shard_grid_state(top: Topology, state: State, mesh: Mesh):
    """State[N,3] -> row-sharded plane arrays (x3, v3, inv_mass3, plane_h)."""
    ny, nx = top.grid_shape
    spec = NamedSharding(mesh, P(None, ROWS_AXIS, None))
    x3 = jax.device_put(jnp.asarray(state.x).T.reshape(3, ny, nx), spec)
    v3 = jax.device_put(jnp.asarray(state.v).T.reshape(3, ny, nx), spec)
    im3 = jax.device_put(jnp.asarray(top.inv_mass).reshape(1, ny, nx), spec)
    ph = jax.device_put(jnp.asarray(top.plane_height).reshape(1))
    return x3, v3, im3, ph


def unshard_to_state(x3, v3, dt) -> State:
    x = x3.reshape(3, -1).T
    v = v3.reshape(3, -1).T
    return State(x=x, v=v, x_prev=x - dt * v)


# ---------------------------------------------------------------------------
# XPBD halo decomposition
# ---------------------------------------------------------------------------

def _halo_xpbd_substep(x3, v3, inv_mass2, xoffsets, cfg, dt,
                       plane_height, ny_global, axis_name, cnt_inv):
    """One XPBD substep on a row-sharded block (inside shard_map).

    Jacobi iterations exchange BOTH positions and the per-offset lambda
    planes each sweep: a constraint owned by a halo row is recomputed
    identically on both neighbouring devices (same x, same lambda inputs),
    so each device reconstructs the reaction corrections that land in its
    interior without any scatter communication — the same recompute-the-
    owner trick as the Euler halo forces, extended with lambda state.
    """
    ny_local, nx = x3.shape[-2], x3.shape[-1]
    dev = jax.lax.axis_index(axis_name)
    movable = inv_mass2 > 0.0
    w = inv_mass2[0]

    g = jnp.asarray(cfg.gravity, dtype=x3.dtype).reshape(3, 1, 1)
    v3 = (v3 + dt * g) * (1.0 - cfg.global_damping * dt)
    v3 = jnp.where(movable, v3, 0.0)
    x_prev = x3
    x3 = x3 + dt * v3

    we = _exchange_halo(w[None], axis_name)[0]          # [ext, nx]

    def iteration(carry, _):
        x3, lams = carry
        xe = _exchange_halo(x3, axis_name)
        dx = jnp.zeros_like(xe)
        new_lams = []
        for o, (di, dj, alpha, rest) in enumerate(xoffsets):
            lam_e = _exchange_halo(lams[o][None], axis_name)[0]
            xn = st._shift(xe, di, dj)
            d = xn - xe
            length = jnp.sqrt(jnp.sum(d * d, axis=0))
            n = d / jnp.maximum(length, 1e-12)
            c_val = length - rest
            alpha_t = alpha / (dt * dt)
            wn = st._shift(we[None], di, dj)[0]
            m = _owned_mask_ext(ny_local, nx, ny_global, di, dj, dev)
            denom = jnp.maximum(we + wn + alpha_t, 1e-12)
            dlam = -(c_val + alpha_t * lam_e) / denom * m
            new_lams.append(dlam[HALO : HALO + ny_local, :] + lams[o])
            dx = dx + (-(we * dlam)) * n + st._shift((wn * dlam) * n, -di, -dj)
        x3 = x3 + cfg.xpbd.relaxation * dx[:, HALO : HALO + ny_local, :] * cnt_inv
        if cfg.collision.enable_plane:
            contact = (x3[1] < plane_height) & movable[0]
            x3 = x3.at[1].set(jnp.where(contact, plane_height, x3[1]))
        return (x3, tuple(new_lams)), None

    # derive zeros from the sharded input so the scan carry keeps the
    # shard_map varying-axis type ({V:rows}); plain jnp.zeros is replicated
    lams0 = tuple(x3[0] * 0.0 for _ in xoffsets)
    (x3, _), _ = jax.lax.scan(
        iteration, (x3, lams0), None, length=cfg.xpbd.n_iterations
    )
    x3 = jnp.where(movable, x3, x_prev)
    v3 = (x3 - x_prev) / dt
    return x3, v3


def _halo_verlet_substep(x3, xp3, inv_mass2, offsets, cfg, dt,
                         plane_height, ny_global, axis_name, spheres=None):
    """One position-Verlet substep on a row-sharded block (oracle
    substep_verlet semantics; halo forces as in _halo_substep)."""
    ny_local, nx = x3.shape[-2], x3.shape[-1]
    dev = jax.lax.axis_index(axis_name)
    v_est = (x3 - xp3) / dt
    xe = _exchange_halo(x3, axis_name)
    ve = _exchange_halo(v_est, axis_name)
    f = jnp.zeros_like(xe)
    for di, dj, k, rest in offsets:
        xn = st._shift(xe, di, dj)
        vn = st._shift(ve, di, dj)
        d = xn - xe
        length = jnp.sqrt(jnp.sum(d * d, axis=0))
        inv_len = 1.0 / jnp.maximum(length, 1e-12)
        n = d * inv_len
        rel_v = jnp.sum((vn - ve) * n, axis=0)
        mask = _owned_mask_ext(ny_local, nx, ny_global, di, dj, dev)
        fmag = (k * (length - rest) + cfg.springs.damping * rel_v) * mask
        fo = fmag * n
        f = f + fo - st._shift(fo, -di, -dj)
    f = f[:, HALO : HALO + ny_local, :]

    movable = inv_mass2 > 0.0
    g = jnp.asarray(cfg.gravity).astype(x3.dtype).reshape(3, 1, 1)
    accel = g + f * inv_mass2
    x_new = x3 + (x3 - xp3) * (1.0 - cfg.global_damping * dt) + accel * dt * dt
    x_new = jnp.where(movable, x_new, x3)
    # position-only projection (Verlet path, oracle project_positions_only)
    if cfg.collision.enable_plane:
        contact = (x_new[1] < plane_height) & movable[0]
        x_new = x_new.at[1].set(jnp.where(contact, plane_height, x_new[1]))
    if cfg.collision.enable_spheres and spheres is not None:
        centers, radii = spheres
        for si in range(radii.shape[0]):
            c = centers[si].reshape(3, 1, 1)
            d = x_new - c
            dist = jnp.sqrt(jnp.sum(d * d, axis=0))
            pen = radii[si] - dist
            contact = (pen > 0.0) & movable[0]
            n = d / jnp.maximum(dist, 1e-12)
            x_new = x_new + jnp.where(contact, pen, 0.0) * n
    return x_new, x3


def make_halo_verlet_step(top: Topology, cfg: SimConfig, mesh: Mesh):
    """Row-sharded position-Verlet stepping; interface as make_halo_step but
    carries (x, x_prev) and returns (x, v=(x - x_prev)/dt)."""
    ny, nx = top.grid_shape
    spheres_on = cfg.collision.enable_spheres and top.n_spheres > 0
    n_dev = mesh.shape[ROWS_AXIS]
    assert ny % n_dev == 0, f"ny={ny} must divide over {n_dev} devices"
    has_shear = EDGE_SHEAR in top.edge_classes_present
    has_bend = EDGE_BEND in top.edge_classes_present
    offsets = st._offsets(cfg, top.grid_spacing, has_shear, has_bend)
    spec = P(None, ROWS_AXIS, None)

    def sharded_steps(x3, xp3, inv_mass3, plane_height, dt, n_substeps,
                      sphere_centers=None, sphere_radii=None):
        def local(x3b, xp3b, imb, ph, *sph):
            spheres = (sph[0], sph[1]) if sph else None

            def body(carry, _):
                xb, xpb = carry
                xb, xpb = _halo_verlet_substep(
                    xb, xpb, imb, offsets, cfg, dt, ph[0], ny, ROWS_AXIS,
                    spheres=spheres,
                )
                return (xb, xpb), None

            (xf, xpf), _ = jax.lax.scan(body, (x3b, xp3b), None, length=n_substeps)
            return xf, (xf - xpf) / dt

        args = (x3, xp3, inv_mass3, plane_height)
        specs = (spec, spec, spec, P())
        if spheres_on:
            if sphere_centers is None:
                raise ValueError("cfg enables spheres: pass sphere geometry")
            args += (sphere_centers, sphere_radii)
            specs += (P(), P())
        return jax.shard_map(
            local, mesh=mesh, in_specs=specs, out_specs=(spec, spec)
        )(*args)

    return sharded_steps


def make_halo_xpbd_step(top: Topology, cfg: SimConfig, mesh: Mesh):
    """Row-sharded XPBD stepping (see make_halo_step for the interface)."""
    from ..kernels.stencil import _xpbd_offsets

    ny, nx = top.grid_shape
    n_dev = mesh.shape[ROWS_AXIS]
    assert ny % n_dev == 0, f"ny={ny} must divide over {n_dev} devices"
    has_shear = EDGE_SHEAR in top.edge_classes_present
    has_bend = EDGE_BEND in top.edge_classes_present
    xoffsets = _xpbd_offsets(cfg, top.grid_spacing, has_shear, has_bend)

    spec = P(None, ROWS_AXIS, None)

    def sharded_steps(x3, v3, inv_mass3, plane_height, dt, n_substeps):
        def local(x3b, v3b, imb, ph):
            ny_local = x3b.shape[-2]
            dev = jax.lax.axis_index(ROWS_AXIS)
            # per-vertex constraint count over owned + owning edges,
            # judged globally on the extended block then sliced
            cnt = jnp.zeros((ny_local + 2 * HALO, nx), x3b.dtype)
            for di, dj, _, _ in xoffsets:
                m = _owned_mask_ext(ny_local, nx, ny, di, dj, dev)
                cnt = cnt + m + st._shift(m[None], -di, -dj)[0]
            cnt_inv = 1.0 / jnp.maximum(cnt[HALO : HALO + ny_local, :], 1.0)

            def body(carry, _):
                xb, vb = carry
                xb, vb = _halo_xpbd_substep(
                    xb, vb, imb, xoffsets, cfg, dt, ph[0], ny,
                    ROWS_AXIS, cnt_inv,
                )
                return (xb, vb), None

            (xf, vf), _ = jax.lax.scan(body, (x3b, v3b), None, length=n_substeps)
            return xf, vf

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(spec, spec, spec, P()),
            out_specs=(spec, spec),
        )(x3, v3, inv_mass3, plane_height)

    return sharded_steps
