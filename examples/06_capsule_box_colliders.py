"""Cloth draping over a capsule and a tilted box — the full Unity
primitive-collider set (plane / sphere / capsule / oriented box).

Collider geometry is Topology *array* data: `sb.move_colliders` animates
the capsule between frames without recompiling, and
`parallel.batch.step_batched_colliders` gives every batched scene its own
geometry (domain randomization).

Run: python examples/06_capsule_box_colliders.py
"""

import numpy as np

import softbodyunity_tpu as sb
from softbodyunity_tpu.core.config import CollisionParams, SimConfig


def rot_z(deg):
    a = np.deg2rad(deg)
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def main(n_frames: int = 90):
    cfg = SimConfig(
        collision=CollisionParams(
            enable_plane=True, enable_capsules=True, enable_boxes=True,
            restitution=0.1, friction=0.4,
        ),
        global_damping=0.3,
    )
    host = sb.cloth_grid(
        32, 32, spacing=0.04, shear=True, bend=True,
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-1.0,
        origin=(-0.6, 0.3, -0.6), orientation="xz",
    )
    host = sb.add_colliders(
        host,
        capsule_p0=[[-0.45, 0.0, 0.0]],
        capsule_p1=[[0.1, 0.0, 0.0]],
        capsule_radii=[0.14],
        box_centers=[[0.35, -0.05, 0.15]],
        box_half_extents=[[0.18, 0.1, 0.14]],
        box_rotations=[rot_z(25.0)],
    )
    top, state = sb.init(host)
    for i in range(n_frames):
        if i == n_frames // 2:  # animate: raise the capsule mid-run
            top = sb.move_colliders(
                top,
                capsule_p0=[[-0.45, 0.05, 0.0]],
                capsule_p1=[[0.1, 0.05, 0.0]],
            )
        state = sb.step(top, cfg, state)
    x = np.asarray(state.x, np.float64)
    assert np.isfinite(x).all()
    p0 = np.array([-0.45, 0.05, 0.0])
    p1 = np.array([0.1, 0.05, 0.0])
    ax = p1 - p0
    t = np.clip((x - p0) @ ax / np.dot(ax, ax), 0.0, 1.0)
    d = np.linalg.norm(x - (p0 + t[:, None] * ax), axis=1)
    print(f"cloth y range: [{x[:, 1].min():+.3f}, {x[:, 1].max():+.3f}]")
    print(f"min clearance to capsule surface: {d.min() - 0.14:+.5f}")
    return state


if __name__ == "__main__":
    main()
