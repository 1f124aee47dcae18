"""Rigid-rigid joints — a crate flail smashing through a hanging cloth.

`sb.add_rigid_joint` wires DYNAMIC rigid bodies together (the Unity
Joint-component analogues): a world ball-socket anchors a chain of two
rod-linked balls (`kind="distance"`, compliance 0 = rigid links), and the
chain's tip carries a crate on a ball joint.  Released from the side, the
flail swings through a hanging cloth — every link constraint, the crate's
tumbling, and the cloth contact all resolve inside the jitted substep
loop.  A hinged gate (`axis=...`) swings in the background on a
world-fixed axis.

    python examples/25_jointed_flail.py
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
                                     enable_boxes=True, restitution=0.2,
                                     friction=0.4),
        global_damping=0.4,
    )
    # hanging cloth curtain in the flail's path
    host = sb.cloth_grid(
        16, 16, spacing=0.05, mass=0.02, pinned=("top",),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-1.2,
        orientation="xy", origin=(-0.4, -0.75, 0.25),
        # chain balls: two links hanging from the world anchor
        sphere_centers=[[0.0, -0.25, 0.0], [0.0, -0.5, 0.0]],
        sphere_radii=[0.06, 0.06],
    )
    host = sb.add_colliders(
        host,
        # crate 0: the flail head at the chain tip; crate 1: a gate panel
        box_centers=[[0.0, -0.68, 0.0], [0.8, -0.3, -0.5]],
        box_half_extents=[[0.09, 0.09, 0.09], [0.18, 0.25, 0.02]],
        box_rotations=[np.eye(3), np.eye(3)],
    )
    anchor = [0.0, 0.0, 0.0]
    host = sb.add_rigid_joint(host, ("sphere", 0), None, point=anchor)
    host = sb.add_rigid_joint(host, ("sphere", 0), ("sphere", 1),
                              kind="distance")
    host = sb.add_rigid_joint(host, ("sphere", 1), ("box", 0),
                              point=[0.0, -0.59, 0.0])
    # the gate hinges on a world-fixed vertical axis at its left edge
    host = sb.add_rigid_joint(host, ("box", 1), None,
                              point=[0.62, -0.3, -0.5], axis=[0.0, 1.0, 0.0])

    top, state = sb.init(host)
    rigid = sb.make_rigid_state(
        top, [0.3, 0.3],
        velocities=[[2.0, 0.0, 1.0], [2.5, 0.0, 1.5]],   # swing it sideways
        box_masses=[0.6, 0.4],
        box_velocities=[[2.5, 0.0, 1.5], [0.0, 0.0, -0.8]],
    )
    for _ in range(n_frames):
        state, rigid = sb.step_coupled(top, cfg, state, rigid)

    x = np.asarray(state.x)
    rc = np.asarray(rigid.centers)
    bc = np.asarray(rigid.box_centers)
    bq = np.asarray(rigid.box_quat)
    assert np.isfinite(x).all() and np.isfinite(rc).all() \
        and np.isfinite(bc).all()
    # the chain held: anchor -> ball0 -> ball1 -> crate distances intact
    from softbodyunity_tpu.oracle.reference import (
        _quat_rotate, _quat_to_matrix)
    q0 = np.asarray(rigid.quat[0], np.float64)
    p0 = rc[0] + _quat_rotate(q0, np.array([0.0, 0.25, 0.0]))
    link = np.linalg.norm(rc[1] - rc[0])
    print(f"anchor weld error   : {np.linalg.norm(p0 - anchor):.2e}")
    print(f"chain link length   : {link:.4f} (rest 0.25)")
    # the gate stayed on its hinge axis
    axis_w = _quat_to_matrix(np.asarray(bq[1], np.float64)) @ [0.0, 1.0, 0.0]
    print(f"gate axis misalign  : {np.linalg.norm(np.cross(axis_w, [0, 1, 0])):.2e}")
    print(f"flail head at       : {bc[0].round(3)}")
    print(f"cloth disturbed (max |x - rest|): "
          f"{np.abs(x - host.positions0).max():.2f}")
    assert abs(link - 0.25) < 5e-3
    assert np.linalg.norm(p0 - anchor) < 5e-3
    print("OK")


if __name__ == "__main__":
    main()
