"""Cloth tearing: a banner pinned along its top row rips under its own
weight and the torn sheet falls away — the classic Unity soft-body demo.

Edge liveness is dynamic state (``State.edge_alive`` f32[E] of {0,1}), so
the edge list never changes shape: tearing is jit/vmap/scan-friendly.
Run: python examples/07_cloth_tearing.py
"""

import numpy as np

import softbodyunity_tpu as sb
from softbodyunity_tpu import SimConfig, SpringParams, TearParams


def main(n_frames: int = 120, nx: int = 24, ny: int = 32):
    cfg = SimConfig(
        springs=SpringParams(k_structural=300.0, k_shear=150.0, k_bend=60.0,
                             damping=0.3),
        tear=TearParams(enabled=True, strain_limit=0.03),
        global_damping=0.1,
    )
    host = sb.cloth_grid(
        nx, ny, spacing=0.05, shear=True, bend=True, pinned=("top",),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-5.0,
        orientation="xy",
    )
    top, state = sb.init(host)

    n_edges = host.edges.shape[0]
    for frame in range(n_frames):
        state = sb.step(top, cfg, state)
        if frame % 20 == 19:
            alive = int(np.asarray(state.edge_alive).sum())
            y_min = float(np.asarray(state.x)[:, 1].min())
            print(f"frame {frame + 1:3d}: {alive}/{n_edges} edges alive, "
                  f"lowest vertex y = {y_min:+.3f}")

    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    torn = n_edges - int(np.asarray(state.edge_alive).sum())
    print(f"torn {torn} edges; the sheet fell "
          f"{-float(x[:, 1].min()):.2f} m below the pins")
    return torn


if __name__ == "__main__":
    main()
