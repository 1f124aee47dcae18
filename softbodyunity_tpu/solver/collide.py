"""Plane / sphere collision resolve — branchless jnp ops.

The reference resolves collisions with per-vertex ``if`` tests inline in the
substep loop ("plane/sphere collision resolve", BASELINE.json:5).  On TPU
branches become ``jnp.where`` masks (SURVEY.md C8/C9); semantics mirror
:func:`softbodyunity_tpu.oracle.reference.resolve_plane` /
``resolve_spheres`` / ``project_positions_only`` exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import SimConfig
from ..core.topology import Topology


def resolve_plane(x, v, plane_y, restitution, friction, movable):
    contact = (x[:, 1] < plane_y) & movable
    y = jnp.where(contact, plane_y, x[:, 1])
    x = x.at[:, 1].set(y)
    vy = v[:, 1]
    vy_new = jnp.where(contact, jnp.where(vy < 0.0, -restitution * vy, vy), vy)
    vx = jnp.where(contact, v[:, 0] * (1.0 - friction), v[:, 0])
    vz = jnp.where(contact, v[:, 2] * (1.0 - friction), v[:, 2])
    return x, jnp.stack([vx, vy_new, vz], axis=1)


def _resolve_one_sphere(x, v, center, radius, restitution, friction, movable):
    d = x - center
    dist = jnp.linalg.norm(d, axis=1)
    pen = radius - dist
    contact = (pen > 0.0) & movable
    n = d / jnp.maximum(dist, 1e-12)[:, None]
    x = x + jnp.where(contact, pen, 0.0)[:, None] * n
    vn = jnp.einsum("ij,ij->i", v, n)
    inward = contact & (vn < 0.0)
    v = v - jnp.where(inward, (1.0 + restitution) * vn, 0.0)[:, None] * n
    vn2 = jnp.einsum("ij,ij->i", v, n)[:, None] * n
    vt = v - vn2
    v = jnp.where(contact[:, None], vn2 + vt * (1.0 - friction), v)
    return x, v


def resolve_spheres(x, v, centers, radii, restitution, friction, movable):
    # S is small and static; a Python loop unrolls into the jitted graph,
    # matching the oracle's sequential per-sphere resolve order.
    for s in range(radii.shape[0]):
        x, v = _resolve_one_sphere(
            x, v, centers[s], radii[s], restitution, friction, movable
        )
    return x, v


def resolve_velocity_level(top: Topology, cfg: SimConfig, x, v, movable):
    """Euler-path resolve: position projection + velocity response."""
    if cfg.collision.enable_plane:
        x, v = resolve_plane(
            x, v, top.plane_height, cfg.collision.restitution,
            cfg.collision.friction, movable,
        )
    if cfg.collision.enable_spheres and top.n_spheres > 0:
        x, v = resolve_spheres(
            x, v, top.sphere_centers, top.sphere_radii,
            cfg.collision.restitution, cfg.collision.friction, movable,
        )
    return x, v


def project_positions_delta(top: Topology, cfg: SimConfig, x_prev, delta,
                            movable):
    """Delta-form twin of :func:`project_positions_only` for the XPBD
    drift-controlled accumulation (solver/step.py substep_xpbd): the plane
    clamp is expressed exactly as ``plane_y - x_prev`` (no rounding crumb),
    spheres as the projection displacement at the evaluation point.  Every
    XPBD path (general, banded, stencil, Pallas, halo) uses these same
    forms so cross-path equivalence stays at rounding level."""
    if cfg.collision.enable_plane:
        xe_y = x_prev[:, 1] + delta[:, 1]
        contact = (xe_y < top.plane_height) & movable
        delta = delta.at[:, 1].set(
            jnp.where(contact, top.plane_height - x_prev[:, 1], delta[:, 1])
        )
    if cfg.collision.enable_spheres and top.n_spheres > 0:
        xe = x_prev + delta
        xproj = xe
        for s in range(top.n_spheres):
            d = xproj - top.sphere_centers[s]
            dist = jnp.linalg.norm(d, axis=1)
            pen = top.sphere_radii[s] - dist
            contact = (pen > 0.0) & movable
            n = d / jnp.maximum(dist, 1e-12)[:, None]
            xproj = xproj + jnp.where(contact, pen, 0.0)[:, None] * n
        delta = delta + (xproj - xe)
    return delta


def project_positions_only(top: Topology, cfg: SimConfig, x, movable):
    """Verlet/XPBD-path resolve: positions only (velocity is implicit)."""
    if cfg.collision.enable_plane:
        contact = (x[:, 1] < top.plane_height) & movable
        x = x.at[:, 1].set(jnp.where(contact, top.plane_height, x[:, 1]))
    if cfg.collision.enable_spheres and top.n_spheres > 0:
        for s in range(top.n_spheres):
            d = x - top.sphere_centers[s]
            dist = jnp.linalg.norm(d, axis=1)
            pen = top.sphere_radii[s] - dist
            contact = (pen > 0.0) & movable
            n = d / jnp.maximum(dist, 1e-12)[:, None]
            x = x + jnp.where(contact, pen, 0.0)[:, None] * n
    return x
