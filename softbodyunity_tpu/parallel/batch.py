"""Scene batching: ``vmap`` over independent scenes (SURVEY.md C14).

The reference steps exactly one scene per frame on the CPU main thread; the
rebuild's RL-rollout config (BASELINE.json:11 "1024-scene vmapped cloth
batch") adds a leading batch axis over ``State`` (and optionally over
collider geometry, so each scene can have its own sphere/plane placement)
while sharing one ``Topology``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import SimConfig
from ..core.state import State
from ..core.topology import Topology
from ..solver import step as _step_mod


def batch_state(state: State, batch: int, jitter: Optional[jax.Array] = None) -> State:
    """Broadcast a single-scene state to ``[B, N, 3]``; optional per-scene
    position jitter (f32[B,3] or f32[B,N,3]) decorrelates the scenes."""
    bx = jnp.broadcast_to(state.x[None], (batch,) + state.x.shape)
    if jitter is not None:
        jitter = jnp.asarray(jitter, dtype=bx.dtype)
        if jitter.ndim == 2:
            jitter = jitter[:, None, :]
        bx = bx + jitter
    alive = state.edge_alive
    if alive is not None:
        alive = jnp.broadcast_to(alive[None], (batch,) + alive.shape)
    scale = state.rest_scale
    if scale is not None:
        scale = jnp.broadcast_to(scale[None], (batch,) + scale.shape)
    quat = state.cluster_quat
    if quat is not None:
        quat = jnp.broadcast_to(quat[None], (batch,) + quat.shape)
    return State(
        x=bx,
        v=jnp.zeros_like(bx),
        x_prev=bx,
        edge_alive=alive,
        rest_scale=scale,
        cluster_quat=quat,
    )


def _ensure_tear_batched(top: Topology, cfg: SimConfig, states: State) -> State:
    """Batched twin of api.ensure_tear_state / ensure_plastic_state
    (outside jit: structure change)."""
    if cfg.tear.enabled and states.edge_alive is None:
        b = states.x.shape[0]
        alive = jnp.ones((b, top.edges.shape[0]), states.x.dtype)
        states = states.replace(edge_alive=alive)
    if cfg.plasticity.enabled and states.rest_scale is None:
        b = states.x.shape[0]
        scale = jnp.ones((b, top.edges.shape[0]), states.x.dtype)
        states = states.replace(rest_scale=scale)
    if (cfg.shape_match.enabled and top.n_clusters > 0
            and states.cluster_quat is None):
        b = states.x.shape[0]
        quat = jnp.zeros((b, top.n_clusters, 4), states.x.dtype)
        states = states.replace(cluster_quat=quat.at[:, :, 0].set(1.0))
    return states


@functools.lru_cache(maxsize=32)
def _compiled_batched_step(cfg: SimConfig, dt: float, n_substeps: int):
    def impl(top: Topology, states: State) -> State:
        fn = lambda s: _step_mod.step_scan(top, cfg, s, dt, n_substeps)
        return jax.vmap(fn)(states)

    return jax.jit(impl)


def step_batched(
    top: Topology,
    cfg: SimConfig,
    states: State,
    dt: Optional[float] = None,
    n_substeps: Optional[int] = None,
) -> State:
    """Advance every scene one frame in lockstep: State[B,N,3] -> State[B,N,3]."""
    dt = cfg.dt if dt is None else float(dt)
    n = cfg.n_substeps if n_substeps is None else int(n_substeps)
    states = _ensure_tear_batched(top, cfg, states)
    return _compiled_batched_step(cfg, dt, n)(top, states)


def rollout_batched(
    top: Topology,
    cfg: SimConfig,
    states: State,
    n_steps: int,
    dt: Optional[float] = None,
    n_substeps: Optional[int] = None,
) -> State:
    """``n_steps`` frames over the whole batch inside one jit (final state
    only — RL observation extraction hooks in here)."""
    dt = cfg.dt if dt is None else float(dt)
    n = cfg.n_substeps if n_substeps is None else int(n_substeps)
    states = _ensure_tear_batched(top, cfg, states)
    return _compiled_rollout_batched(cfg, dt, n, int(n_steps))(top, states)


@functools.lru_cache(maxsize=32)
def _compiled_rollout_batched(cfg: SimConfig, dt: float, n_substeps: int,
                              n_steps: int):
    """Cached executable: repeated batched rollouts must not recompile."""

    def impl(top, states):
        def body(ss, _):
            fn = lambda s: _step_mod.step_scan(top, cfg, s, dt, n_substeps)
            return jax.vmap(fn)(ss), None

        out, _ = jax.lax.scan(body, states, None, length=n_steps)
        return out

    return jax.jit(impl)


@functools.lru_cache(maxsize=32)
def _compiled_hetero_step(cfg: SimConfig, dt: float, n_substeps: int):
    import dataclasses

    def impl(top: Topology, states: State, sphere_centers, sphere_radii):
        def fn(s, sc, sr):
            t = dataclasses.replace(top, sphere_centers=sc, sphere_radii=sr)
            return _step_mod.step_scan(t, cfg, s, dt, n_substeps)

        return jax.vmap(fn, in_axes=(0, 0, 0))(states, sphere_centers, sphere_radii)

    return jax.jit(impl)


def step_batched_hetero(
    top: Topology,
    cfg: SimConfig,
    states: State,
    sphere_centers,
    sphere_radii,
    dt: Optional[float] = None,
    n_substeps: Optional[int] = None,
) -> State:
    """Batched stepping where every scene carries its OWN sphere colliders
    (f32[B, S, 3] / f32[B, S]) — collider geometry is Topology array data,
    so per-scene geometry is just a vmapped axis (the docstring promise on
    core/topology.Topology, honored).  Domain-randomized RL setups move or
    resize obstacles per scene without recompiling."""
    dt = cfg.dt if dt is None else float(dt)
    n = cfg.n_substeps if n_substeps is None else int(n_substeps)
    states = _ensure_tear_batched(top, cfg, states)
    return _compiled_hetero_step(cfg, dt, n)(
        top, states, jnp.asarray(sphere_centers, jnp.float32),
        jnp.asarray(sphere_radii, jnp.float32),
    )


_COLLIDER_FIELDS = (
    "plane_height", "sphere_centers", "sphere_radii",
    "capsule_p0", "capsule_p1", "capsule_radii",
    "box_centers", "box_half_extents", "box_rotations",
    # per-scene mesh (SDF) collider placement: the baked grid is shared
    # from top, each scene translates it via its own origins
    "sdf_origins",
    # per-scene kinematic collider velocities (relative-frame contact)
    "plane_velocity", "sphere_velocities", "capsule_velocities",
    "box_velocities", "sdf_velocities",
    # per-scene motion-constraint tethers (each scene's skinned-body
    # anchor targets; see api.move_tethers)
    "tether_anchor", "tether_radius",
)


@functools.lru_cache(maxsize=32)
def _compiled_collider_step(cfg: SimConfig, dt: float, n_substeps: int,
                            names: tuple):
    import dataclasses

    def impl(top: Topology, states: State, *arrays):
        def fn(s, *per_scene):
            t = dataclasses.replace(top, **dict(zip(names, per_scene)))
            return _step_mod.step_scan(t, cfg, s, dt, n_substeps)

        return jax.vmap(fn)(states, *arrays)

    return jax.jit(impl)


def step_batched_colliders(
    top: Topology,
    cfg: SimConfig,
    states: State,
    dt: Optional[float] = None,
    n_substeps: Optional[int] = None,
    **collider_arrays,
) -> State:
    """Generalized per-scene collider batching: pass any subset of
    ``plane_height`` (f32[B]), ``sphere_centers``/``sphere_radii``,
    ``capsule_p0``/``capsule_p1``/``capsule_radii``,
    ``box_centers``/``box_half_extents``/``box_rotations``, or
    ``sdf_origins`` (per-scene placement of the shared baked SDF grids),
    or ``tether_anchor``/``tether_radius`` (per-scene motion-constraint
    targets — each RL scene's skinned body somewhere else)
    with a leading batch axis; unlisted geometry is shared from ``top``.
    One compiled
    executable per (cfg, field-set) — moving geometry between calls never
    retraces."""
    bad = set(collider_arrays) - set(_COLLIDER_FIELDS)
    if bad:
        raise ValueError(f"unknown collider fields: {sorted(bad)}")
    names = tuple(sorted(collider_arrays))
    arrays = tuple(
        jnp.asarray(collider_arrays[k], jnp.float32) for k in names
    )
    dt = cfg.dt if dt is None else float(dt)
    n = cfg.n_substeps if n_substeps is None else int(n_substeps)
    states = _ensure_tear_batched(top, cfg, states)
    return _compiled_collider_step(cfg, dt, n, names)(top, states, *arrays)
