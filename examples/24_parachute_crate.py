"""A parachute crate — box attachments (`sb.attach_box`) + wind drag.

A square cloth canopy is welded at its four corners to the four top
corners of a crate (`sb.attach_box`: the welds ride the crate's
orientation, solved with the box's anisotropic inertia).  Dropped in
still air with aerodynamic drag on the cloth, the canopy balloons and
the crate falls at terminal velocity — far slower than the same crate
dropped bare.

    python examples/24_parachute_crate.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import softbodyunity_tpu as sb


def _drop(with_canopy: bool, n_frames: int):
    cfg = sb.SimConfig(
        springs=sb.SpringParams(k_structural=1200.0, k_shear=600.0,
                                k_bend=150.0, damping=1.0),
        collision=sb.CollisionParams(enable_plane=False, enable_boxes=True),
        wind=sb.WindParams(velocity=(0.0, 0.0, 0.0), drag=0.35),
        global_damping=0.05,
    )
    n = 9
    host = sb.cloth_grid(
        n, n, spacing=0.08, mass=0.01, pinned=(),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-50.0,
        orientation="xz", origin=(-0.32, 0.0, -0.32),
    )
    host = sb.add_colliders(
        host, box_centers=[[0.0, -0.45, 0.0]],
        box_half_extents=[[0.08, 0.06, 0.08]],
        box_rotations=[np.eye(3)])
    if with_canopy:
        # canopy corner vertices -> crate top corners
        corners = [0, n - 1, n * (n - 1), n * n - 1]
        tops = [[-0.08, -0.39, -0.08], [0.08, -0.39, -0.08],
                [-0.08, -0.39, 0.08], [0.08, -0.39, 0.08]]
        host = sb.attach_box(host, corners, [0, 0, 0, 0], points=tops)
    else:
        # bare crate: pin the cloth far away so only the crate falls
        host = sb.cloth_grid(
            n, n, spacing=0.08, mass=0.01,
            pinned=("top", "bottom", "left", "right"),
            springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-50.0,
            orientation="xz", origin=(50.0, 0.0, 50.0))
        host = sb.add_colliders(
            host, box_centers=[[0.0, -0.45, 0.0]],
            box_half_extents=[[0.08, 0.06, 0.08]],
            box_rotations=[np.eye(3)])
    top, state = sb.init(host)
    rigid = sb.make_rigid_state(top, box_masses=[0.25])
    for _ in range(n_frames):
        state, rigid = sb.step_coupled(top, cfg, state, rigid)
    bc = np.asarray(rigid.box_centers)[0]
    bv = np.asarray(rigid.box_velocities)[0]
    assert np.isfinite(np.asarray(state.x)).all() and np.isfinite(bc).all()
    return bc, bv


def main(n_frames: int = 240):
    bc_p, bv_p = _drop(True, n_frames)
    bc_b, bv_b = _drop(False, n_frames)
    print(f"with canopy:  y={bc_p[1]:+8.3f}  v_y={bv_p[1]:+7.3f}")
    print(f"bare crate:   y={bc_b[1]:+8.3f}  v_y={bv_b[1]:+7.3f}")
    ratio = bv_p[1] / bv_b[1]
    print(f"fall-speed ratio (canopy/bare): {ratio:.3f}")
    assert bc_p[1] > bc_b[1] + 0.5, "canopy did not slow the fall"
    assert abs(bv_p[1]) < 0.65 * abs(bv_b[1]), "no terminal-velocity gap"
    return float(ratio)


if __name__ == "__main__":
    main()
