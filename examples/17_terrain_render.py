"""Cloth settling over rolling terrain, rendered to PNG frames.

`terrain_mesh` builds a closed heightfield block (the Unity Terrain
analogue), `sdf_from_mesh` bakes it into a mesh collider, and
`render_rollout` writes shaded preview frames — the full asset loop:
procedural geometry -> collider -> simulation -> images.
Run: python examples/17_terrain_render.py
"""

import os

import numpy as np

import softbodyunity_tpu as sb
from softbodyunity_tpu import CollisionParams, SimConfig
from softbodyunity_tpu.core.sdf import sdf_from_mesh


def main(out_dir: str = "/tmp/terrain_frames", n_frames: int = 60, n: int = 24,
         resolution: int = 28):
    # rolling hills: two gaussian bumps on a 12x12 heightfield
    hw = 12
    ii, jj = np.meshgrid(np.arange(hw), np.arange(hw), indexing="ij")
    h = (0.25 * np.exp(-((ii - 4.0) ** 2 + (jj - 4.0) ** 2) / 6.0)
         + 0.18 * np.exp(-((ii - 8.0) ** 2 + (jj - 8.5) ** 2) / 4.0))
    t_pos, t_tri = sb.terrain_mesh(h, spacing=0.1, base_depth=0.15)
    grid, origin, spacing = sdf_from_mesh(t_pos, t_tri,
                                          resolution=resolution)

    cfg = SimConfig(
        collision=CollisionParams(enable_plane=False, enable_sdf=True,
                                  friction=0.4),
        global_damping=1.5,
    )
    host = sb.cloth_grid(
        n, n, spacing=1.1 / (n - 1), mass=0.05, pinned=(),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-10.0,
        orientation="xz", origin=(0.0, 0.6, 0.0),
    )
    host = sb.add_colliders(host, sdf_grids=grid, sdf_origins=origin,
                            sdf_spacings=[spacing])
    top, state = sb.init(host)
    state, written = sb.render_rollout(
        top, cfg, state, n_frames, out_dir, every=max(n_frames // 4, 1),
    )
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    # the cloth drapes ON the hills: its mid region sits above the bumps
    # (not sunk to the terrain base at y<=0)
    assert x[:, 1].min() > -0.16
    assert x[:, 1].max() > 0.15
    pngs = sorted(p for p in os.listdir(out_dir) if p.endswith(".png"))
    assert len(pngs) == written and written >= 1
    print(f"cloth draped over terrain: y in [{x[:, 1].min():+.3f}, "
          f"{x[:, 1].max():+.3f}]; {written} PNGs in {out_dir}")
    print("OK: terrain collider + PNG preview pipeline")
    return written


if __name__ == "__main__":
    main()
