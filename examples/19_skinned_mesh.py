"""Render-mesh skinning: a fine icosphere driven by a coarse simulated
tet cube (the Unity proxy-mesh pattern — simulate low-res, render hi-res).

The 5^3 lattice (125 vertices) is simulated; the 642-vertex icosphere is
bound once with ``embed_mesh`` (containing-tet barycentric) and deformed
per frame with ``skin`` — a single gather outside the substep scan.

    python examples/19_skinned_mesh.py [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import softbodyunity_tpu as sb
from softbodyunity_tpu.utils import meshio


def main(out_dir="/tmp/skin_demo", n_frames=120, subdivisions=3):
    os.makedirs(out_dir, exist_ok=True)
    cfg = sb.SimConfig(
        springs=sb.SpringParams(k_structural=400.0, damping=0.4),
        collision=sb.CollisionParams(enable_plane=True, friction=0.3),
        volume_stiffness=0.5,
        global_damping=0.5,
    )
    host = sb.tet_cube(
        5, spacing=0.1, mass=0.02, springs=cfg.springs, xpbd=cfg.xpbd,
        plane_height=0.0, origin=(0.0, 0.45, 0.0),
    )
    center = host.positions0.mean(0)
    ball_pos, ball_tri = sb.icosphere_mesh(
        radius=0.19, center=tuple(center), subdivisions=subdivisions)
    emb = sb.embed_mesh(host, ball_pos, ball_tri)
    print(f"sim mesh {host.positions0.shape[0]} verts -> "
          f"render mesh {ball_pos.shape[0]} verts")

    top, state = sb.init(host)
    for f in range(n_frames):
        state = sb.step(top, cfg, state)
        if f % 15 == 0:
            p = sb.skin(emb, state.x)
            n = sb.skin_normals(emb, state.x)
            meshio.write_obj_raw(
                f"{out_dir}/ball_{f:03d}.obj", p, ball_tri, n)
    p = np.asarray(sb.skin(emb, state.x))
    assert np.isfinite(p).all()
    print(f"wrote {out_dir}/ball_*.obj; final render-mesh "
          f"y-range [{p[:, 1].min():.3f}, {p[:, 1].max():.3f}]")


if __name__ == "__main__":
    main(*sys.argv[1:])
