"""Offline PNG preview renderer — the "see your cloth" half of the render
handoff (C11 computes normals, `utils.meshio` exports OBJ; this draws).

The reference hands deformed vertices to Unity's renderer every frame
("C# per-vertex mesh mutation", BASELINE.json:5).  Standalone, the
equivalent developer need is a quick shaded look at a simulation state
without a DCC roundtrip: flat-shaded triangles (painter-sorted by
matplotlib's Poly3DCollection), single-directional Lambert lighting, and
the scene's plane/sphere colliders sketched in for context.  Host-side,
matplotlib-only, observable-tier — never inside a hot loop.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..core.config import SimConfig
from ..core.state import State
from ..core.topology import Topology


def render_frame(
    top: Topology,
    state: State,
    path: Optional[str] = None,
    *,
    elev: float = 22.0,
    azim: float = -55.0,
    light=(0.35, 0.8, 0.45),
    color=(0.36, 0.55, 0.88),
    draw_colliders: bool = True,
    plane_height: Optional[float] = None,
    figsize: float = 5.0,
    dpi: int = 120,
):
    """Render one shaded frame; saves a PNG when ``path`` is given (the
    figure is closed), else returns ``(fig, ax)`` for notebook use."""
    import matplotlib

    if path is not None:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    x = np.asarray(state.x, np.float64)
    tri = np.asarray(top.triangles, np.int64)
    fig = plt.figure(figsize=(figsize, figsize), dpi=dpi)
    ax = fig.add_subplot(111, projection="3d")

    if tri.shape[0] > 0:
        pts = x[tri]                                  # [F, 3, 3]
        e1 = pts[:, 1] - pts[:, 0]
        e2 = pts[:, 2] - pts[:, 0]
        n = np.cross(e1, e2)
        n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
        l = np.asarray(light, np.float64)
        l /= np.linalg.norm(l)
        # two-sided Lambert + ambient floor
        shade = 0.25 + 0.75 * np.abs(n @ l)
        face_rgba = np.empty((tri.shape[0], 4))
        face_rgba[:, :3] = shade[:, None] * np.asarray(color)[None, :]
        face_rgba[:, 3] = 1.0
        coll = Poly3DCollection(pts, facecolors=face_rgba,
                                edgecolors="none", zsort="average")
        ax.add_collection3d(coll)
    else:
        ax.scatter(x[:, 0], x[:, 1], x[:, 2], s=1.0, c=[color])

    lo = x.min(axis=0)
    hi = x.max(axis=0)
    if draw_colliders:
        ph = (float(np.asarray(top.plane_height))
              if plane_height is None else plane_height)
        if lo[1] - 0.5 < ph <= hi[1] + 0.5:           # plane in view
            gx = np.linspace(lo[0] - 0.1, hi[0] + 0.1, 2)
            gz = np.linspace(lo[2] - 0.1, hi[2] + 0.1, 2)
            gxx, gzz = np.meshgrid(gx, gz)
            ax.plot_surface(gxx, np.full_like(gxx, ph), gzz,
                            color=(0.5, 0.5, 0.5, 0.25), shade=False)
            lo[1] = min(lo[1], ph)
        centers = np.asarray(top.sphere_centers, np.float64).reshape(-1, 3)
        radii = np.asarray(top.sphere_radii, np.float64).reshape(-1)
        u = np.linspace(0, 2 * np.pi, 18)
        v = np.linspace(0, np.pi, 10)
        for c, r in zip(centers, radii):
            sx = c[0] + r * np.outer(np.cos(u), np.sin(v))
            sy = c[1] + r * np.outer(np.sin(u), np.sin(v))
            sz = c[2] + r * np.outer(np.ones_like(u), np.cos(v))
            ax.plot_wireframe(sx, sy, sz, color=(0.4, 0.4, 0.4),
                              linewidth=0.4, rstride=2, cstride=2)

    # equal aspect around the scene
    ctr = 0.5 * (lo + hi)
    half = max(float((hi - lo).max()) * 0.55, 1e-3)
    ax.set_xlim(ctr[0] - half, ctr[0] + half)
    ax.set_ylim(ctr[1] - half, ctr[1] + half)
    ax.set_zlim(ctr[2] - half, ctr[2] + half)
    ax.set_box_aspect((1, 1, 1))
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    fig.tight_layout(pad=0)

    if path is None:
        return fig, ax
    fig.savefig(path)
    plt.close(fig)
    return None


def render_rollout(
    top: Topology,
    cfg: SimConfig,
    state: State,
    n_frames: int,
    out_dir: str,
    *,
    every: int = 1,
    prefix: str = "frame",
    **kw,
) -> Tuple[State, int]:
    """Step ``n_frames`` and save ``{out_dir}/{prefix}_{k:04d}.png`` every
    ``every`` frames (ffmpeg-ready sequence).  Returns the final state and
    the number of images written."""
    from .. import api

    os.makedirs(out_dir, exist_ok=True)
    written = 0
    for i in range(n_frames):
        state = api.step(top, cfg, state)
        if (i + 1) % every == 0:
            render_frame(
                top, state,
                os.path.join(out_dir, f"{prefix}_{written:04d}.png"), **kw,
            )
            written += 1
    return state, written
