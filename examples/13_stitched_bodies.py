"""Attachments between soft bodies: a curtain sewn from two panels.

`merge_bodies` places several soft bodies in one scene (the analogue of
several soft-body GameObjects); `stitch` sews vertex pairs together with
springs — a seam joining cloth panels, a flag laced to a rope, a handle
strapped to a soft cube ("spring-force accumulation over edge lists",
BASELINE.json:5, extended to inter-body edges).  The lower panel hangs
entirely from six rest-zero stitches on the upper panel's hem.
Run: python examples/13_stitched_bodies.py
"""

import numpy as np

import softbodyunity_tpu as sb
from softbodyunity_tpu import SimConfig


def main(n_frames: int = 120, n: int = 10, spacing: float = 0.05):
    cfg = SimConfig(global_damping=0.5)
    upper = sb.cloth_grid(
        n, n, spacing=spacing, mass=0.05, pinned=("top",), springs=cfg.springs,
        xpbd=cfg.xpbd, plane_height=-10.0, orientation="xy",
    )
    lower = sb.cloth_grid(
        n, n, spacing=spacing, mass=0.05, pinned=(), springs=cfg.springs,
        xpbd=cfg.xpbd, plane_height=-10.0, orientation="xy",
        origin=(0.0, -n * spacing, 0.0),
    )
    scene = sb.merge_bodies(upper, lower)
    hem = [(n - 1) * n + j for j in range(n)]     # upper panel, last row
    brim = [n * n + j for j in range(n)]          # lower panel, first row
    scene = sb.stitch(scene, hem, brim, rest_length=0.0, stiffness=5e3)

    top, state = sb.init(scene)
    for _ in range(n_frames):
        state = sb.step(top, cfg, state)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    gap = np.linalg.norm(x[hem] - x[brim], axis=1).max()
    print(f"seam max gap {gap:.4f}; curtain spans y "
          f"[{x[:, 1].min():+.3f}, {x[:, 1].max():+.3f}]")
    # the free panel hangs from the seam (curtain length ~2n*spacing plus
    # spring sag) instead of falling to the floor at -10
    assert x[n * n:, 1].min() > -3.0 * n * spacing
    assert gap < 0.1
    print("OK: lower panel hangs entirely from the stitched seam")
    return float(gap)


if __name__ == "__main__":
    main()
