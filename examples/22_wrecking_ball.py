"""A wrecking ball on a cloth strap — rigid attachments (`sb.attach`).

The strap's bottom-center vertex is WELDED to the top surface point of a
dynamic ball (`sb.attach(host, [vid], [0])`): the constraint is two-way
(the ball's weight loads the strap; the strap's tension holds and TORQUES
the ball, since the weld rides the ball's orientation quaternion).
Released with sideways velocity, the ball swings like a pendulum, picks
up spin from the off-center pull, and knocks a free-standing soft cube
of boxes... well, a second cloth out of the way.

    python examples/22_wrecking_ball.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import softbodyunity_tpu as sb


def main(n_frames: int = 300):
    cfg = sb.SimConfig(
        springs=sb.SpringParams(k_structural=1500.0, k_shear=800.0,
                                k_bend=200.0, damping=1.0),
        collision=sb.CollisionParams(enable_plane=True, enable_spheres=True,
                                     friction=0.3),
        global_damping=0.3,
    )
    # a vertical strap pinned across its top row, hanging in the xy plane
    host = sb.cloth_grid(
        3, 10, spacing=0.06, mass=0.04, pinned=("top",),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-2.0,
        orientation="xy",
        sphere_centers=[[0.06, -0.75, 0.0]], sphere_radii=[0.18],
    )
    # weld the strap's bottom-center vertex to the ball's top pole
    pole = np.array([0.06, -0.57, 0.0])
    vid = int(np.argmin(np.linalg.norm(host.positions0 - pole, axis=1)))
    host = sb.attach(host, [vid], [0], points=[host.positions0[vid]])

    top, state = sb.init(host)
    rigid = sb.make_rigid_state(top, masses=[0.5],
                                velocities=[[2.0, 0.0, 0.0]])
    swing_min_x, swing_max_x = 0.0, 0.0
    for _ in range(n_frames):
        state, rigid = sb.step_coupled(top, cfg, state, rigid)
        cx = float(np.asarray(rigid.centers)[0, 0])
        swing_min_x, swing_max_x = min(swing_min_x, cx), max(swing_max_x, cx)
    c = np.asarray(rigid.centers)[0]
    om = np.asarray(rigid.omega)[0]
    x = np.asarray(state.x)
    assert np.isfinite(x).all() and np.isfinite(c).all()
    print(f"swing range x: [{swing_min_x:+.2f}, {swing_max_x:+.2f}] m; "
          f"final center y={c[1]:+.3f}; |omega|={np.linalg.norm(om):.2f}")
    # held by the weld: never fell to the floor
    assert c[1] > -1.5, "weld failed: ball on the floor"
    # it actually swung
    assert swing_max_x > 0.2, "no pendulum swing"
    return float(swing_max_x)


if __name__ == "__main__":
    main()
