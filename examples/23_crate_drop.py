"""Dynamic rigid crates — the scene's oriented boxes as rigid bodies.

`sb.make_rigid_state(top, box_masses=[...])` promotes every box collider
to a dynamic rigid body with solid-box inertia and an orientation
quaternion: crates fall, hit the trampoline cloth, exchange momentum and
ANGULAR momentum with it (an off-center landing spins the crate), bounce
off the ground plane on their corners (edge landings tumble flat), and
settle.  Here a tilted crate is dropped onto a pinned-edge cloth next to
a second crate dropped past the cloth straight onto the floor.

    python examples/23_crate_drop.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import softbodyunity_tpu as sb


def main(n_frames: int = 400):
    cfg = sb.SimConfig(
        springs=sb.SpringParams(k_structural=2000.0, k_shear=1000.0,
                                k_bend=400.0, damping=1.5),
        collision=sb.CollisionParams(enable_plane=True, enable_boxes=True,
                                     restitution=0.25, friction=0.45),
        global_damping=0.5,
    )
    c, s = np.cos(0.5), np.sin(0.5)
    tilt = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    host = sb.cloth_grid(
        12, 12, spacing=0.1, mass=0.06,
        pinned=("top", "bottom", "left", "right"),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-1.0,
        orientation="xz", origin=(-0.55, 0.0, -0.55),
    )
    host = sb.add_colliders(
        host,
        # crate 0: tilted, above the cloth; crate 1: off to the side,
        # falls straight to the floor and tumbles flat
        box_centers=[[0.05, 0.7, 0.0], [1.5, 0.2, 0.0]],
        box_half_extents=[[0.12, 0.08, 0.10], [0.10, 0.06, 0.08]],
        box_rotations=[tilt, tilt],
    )
    top, state = sb.init(host)
    rigid = sb.make_rigid_state(top, box_masses=[0.5, 0.3],
                                box_omega=[[0.0, 0.0, -2.0],
                                           [0.0, 0.0, 0.0]])
    for _ in range(n_frames):
        state, rigid = sb.step_coupled(top, cfg, state, rigid)
    bc = np.asarray(rigid.box_centers)
    bv = np.asarray(rigid.box_velocities)
    bq = np.asarray(rigid.box_quat)
    x = np.asarray(state.x)
    assert np.isfinite(x).all() and np.isfinite(bc).all()
    from softbodyunity_tpu.oracle.reference import _quat_to_matrix
    up1 = np.abs((_quat_to_matrix(bq[1]) @ tilt)[1, :])
    print(f"crate 0 (on cloth): y={bc[0, 1]:+.3f}  |v|="
          f"{np.linalg.norm(bv[0]):.3f}")
    print(f"crate 1 (on floor): y={bc[1, 1]:+.3f}  |v|="
          f"{np.linalg.norm(bv[1]):.3f}  up-axis={up1.round(3)}")
    assert bc[0, 1] > -0.7, "crate 0 fell through the cloth"
    assert -1.0 < bc[1, 1] < -0.85, "crate 1 not resting on the plane"
    assert up1.max() > 0.95, "crate 1 did not tumble flat"
    return float(bc[0, 1])


if __name__ == "__main__":
    main()
