"""A rope bridge catches a rigid ball — 1D chains composed with on-device
two-way rigid coupling.

`rope()` builds the chain (structural + bend springs, fully banded);
`make_rigid_state` promotes the scene sphere to a 0.3 kg dynamic body;
`step_coupled` exchanges momentum inside the substep scan.  The ball
lands mid-span, the rope sags and stretches, and the ball settles in the
crease.

    python examples/21_rope_bridge.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import softbodyunity_tpu as sb


def main(n_frames: int = 240, n: int = 48):
    cfg = sb.SimConfig(
        springs=sb.SpringParams(k_structural=2000.0, k_bend=100.0,
                                damping=1.2),
        collision=sb.CollisionParams(enable_plane=True, enable_spheres=True,
                                     friction=0.4),
        global_damping=0.4,
    )
    host = sb.rope(
        n, p0=(0.0, 0.0, 0.0), p1=(2.0, 0.0, 0.0), mass=0.01,
        pinned=("start", "end"), springs=cfg.springs, xpbd=cfg.xpbd,
        plane_height=-2.0,
    )
    host.sphere_centers = np.array([[1.0, 0.5, 0.0]])   # drop onto mid-span
    host.sphere_radii = np.array([0.15])                # > vertex spacing

    top, state = sb.init(host)
    rigid = sb.make_rigid_state(top, masses=[0.3])
    for _ in range(n_frames):
        state, rigid = sb.step_coupled(top, cfg, state, rigid)
    x = np.asarray(state.x)
    c = np.asarray(rigid.centers)[0]
    assert np.isfinite(x).all() and np.isfinite(c).all()
    sag = -x[:, 1].min()
    print(f"rope sag {sag:.3f} m; ball center y={c[1]:+.3f} "
          f"(radius 0.15, floor at -2.0)")
    # caught: the ball rests on the rope, not the floor
    assert c[1] > -1.5, "ball fell through the rope"
    return float(c[1])


if __name__ == "__main__":
    main()
