"""Render sync: get simulation state back to a renderer.

The reference hands state to Unity every frame via ``mesh.vertices =
positions; mesh.RecalculateNormals()`` ("C# per-vertex mesh mutation",
BASELINE.json:5).  The TPU rebuild's equivalent is a single device->host
fetch per *rendered* frame (positions + normals computed on device), plus
exporters for offline viewing:

* :func:`frame` — one host-side (positions, normals) pair.
* :func:`write_obj` — Wavefront OBJ snapshot (any viewer opens it).
* :func:`record_rollout` — simulate n frames, return/save stacked
  positions+normals (the npz is a renderable animation).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax

from .. import api
from ..core.config import SimConfig
from ..core.state import State
from ..core.topology import Topology
from ..solver.normals import vertex_normals


def frame(top: Topology, state: State) -> Tuple[np.ndarray, np.ndarray]:
    """(positions f32[N,3], unit normals f32[N,3]) on host — the per-frame
    render handoff.  One fused device computation + one fetch."""
    n = jax.jit(vertex_normals)(top.triangles, state.x)
    return np.asarray(state.x), np.asarray(n)


def write_obj(path: str, top: Topology, state: State) -> None:
    """Wavefront OBJ snapshot with normals (1-indexed faces)."""
    v, n = frame(top, state)
    tris = np.asarray(top.triangles)
    with open(path, "w") as f:
        f.write("# softbodyunity_tpu export\n")
        for p in v:
            f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for p in n:
            f.write(f"vn {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for t in tris:
            a, b, c = (int(i) + 1 for i in t)
            f.write(f"f {a}//{a} {b}//{b} {c}//{c}\n")


def record_rollout(
    top: Topology,
    cfg: SimConfig,
    state: State,
    n_frames: int,
    path: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray, State]:
    """Simulate ``n_frames`` frames, fetching (positions, normals) each
    frame — the animation record.  Saves to ``path`` (.npz) if given."""
    xs, ns = [], []
    for _ in range(n_frames):
        state = api.step(top, cfg, state)
        x, n = frame(top, state)
        xs.append(x)
        ns.append(n)
    xs = np.stack(xs)
    ns = np.stack(ns)
    if path:
        np.savez_compressed(
            path, positions=xs, normals=ns,
            triangles=np.asarray(top.triangles),
        )
    return xs, ns, state
