"""Topspin bowling: a spinning rigid ball races across a cloth runway.

On-device two-way coupling with spin (`step_coupled` +
`make_rigid_state(..., omega=...)`): a ball with heavy topspin is set on
a pinned-edge cloth runway.  Spin-drag (the cloth sees the ball's
surface velocity `v + ω×(r·n)`) converts rotation into forward motion —
the ball accelerates itself OUT of the dent it makes, rolling down the
runway while the reaction torque spins it down; the dragged cloth
ripples behind it.  Compare `test_friction_rolls_the_ball` (plane) and
`test_spinning_ball_drags_cloth` (cloth) for the verified mechanics.
Run: python examples/18_bowling_spin.py
"""

import numpy as np

import softbodyunity_tpu as sb
from softbodyunity_tpu import CollisionParams, SimConfig, SpringParams


def main(n_frames: int = 120, n: int = 12):
    cfg = SimConfig(
        springs=SpringParams(k_structural=3000.0, k_shear=1500.0,
                             k_bend=600.0, damping=1.5),
        collision=CollisionParams(enable_plane=False, enable_spheres=True,
                                  friction=0.4),
        global_damping=1.0,
    )
    # long runway: 3x1 cloth, all edges pinned
    nx, ny = 3 * n, n
    host = sb.cloth_grid(
        nx, ny, spacing=1.0 / (n - 1), mass=0.08,
        pinned=("top", "bottom", "left", "right"),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-10.0,
        orientation="xz",
        sphere_centers=[[0.3, 0.1, 0.5]], sphere_radii=[0.16],
    )
    top, state = sb.init(host)
    # heavy topspin about -z: surface velocity at the bottom points -x,
    # so friction pushes the ball +x (down the runway)
    rigid = sb.make_rigid_state(top, [0.4], omega=[[0.0, 0.0, -30.0]])

    x0 = float(rigid.centers[0, 0])
    for _ in range(n_frames):
        state, rigid = sb.step_coupled(top, cfg, state, rigid)
    c = np.asarray(rigid.centers)[0]
    v = np.asarray(rigid.velocities)[0]
    om = np.asarray(rigid.omega)[0]
    x = np.asarray(state.x)
    assert np.isfinite(x).all() and np.isfinite(c).all()
    print(f"ball: x {x0:+.2f} -> {c[0]:+.2f} (v_x {v[0]:+.2f}), spin "
          f"{-30.0:+.1f} -> {om[2]:+.1f} rad/s; cloth dent ymin "
          f"{x[:, 1].min():+.3f}")
    # the spin propelled the ball down the runway...
    assert c[0] > x0 + 0.5
    assert v[0] > 0.1
    # ...while the reaction torque spun it down
    assert om[2] > -30.0 + 5.0
    # and the ball stayed ON the runway (caught by the cloth)
    assert c[1] > -0.5
    print("OK: topspin converted to forward rolling on the cloth runway")
    return float(c[0] - x0)


if __name__ == "__main__":
    main()
