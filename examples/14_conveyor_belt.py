"""Kinematic collider velocities: a conveyor belt and a dragged sphere.

Collider *velocities* are Topology array data (``plane_velocity``,
``sphere_velocities``, ...): contact friction/restitution act on the
velocity RELATIVE to the collider, so a plane with a surface velocity is a
conveyor belt and a sphere swept under a draped cloth carries the cloth
along (the Unity kinematic-Rigidbody contact analogue).  Animate geometry
with ``move_colliders`` and set the matching velocity for consistent
contact.  Run: python examples/14_conveyor_belt.py
"""

import numpy as np

import softbodyunity_tpu as sb
from softbodyunity_tpu import CollisionParams, SimConfig


def main(n_frames: int = 90, n: int = 12):
    cfg = SimConfig(
        collision=CollisionParams(enable_plane=True, enable_spheres=True,
                                  friction=0.5),
        global_damping=0.05,
    )
    host = sb.cloth_grid(
        n, n, spacing=0.05, pinned=(), springs=cfg.springs, xpbd=cfg.xpbd,
        plane_height=0.0, origin=(0.0, 0.02, 0.0), orientation="xz",
        sphere_centers=np.array([[-0.6, 0.1, 0.3]]),
        sphere_radii=np.array([0.15]),
    )
    host = sb.add_colliders(host, plane_velocity=[0.5, 0.0, 0.0])
    top, state = sb.init(host)

    frame_dt = cfg.dt * cfg.n_substeps
    sphere_v = np.array([[0.8, 0.0, 0.0]], np.float32)
    c0 = np.asarray(top.sphere_centers)
    for k in range(n_frames):
        # sweep the sphere under the belt region; velocity matches motion
        top = sb.move_colliders(
            top,
            sphere_centers=c0 + sphere_v * (k + 1) * frame_dt,
            sphere_velocities=sphere_v,
        )
        state = sb.step(top, cfg, state)

    x = np.asarray(state.x)
    v = np.asarray(state.v)
    assert np.isfinite(x).all()
    mean_vx = float(v[:, 0].mean())
    print(f"belt carried the cloth: mean vx = {mean_vx:+.3f} "
          f"(belt 0.5), x span [{x[:, 0].min():+.2f}, {x[:, 0].max():+.2f}]")
    assert mean_vx > 0.3, "conveyor should drag the resting cloth along +x"
    assert x[:, 1].min() >= -1e-5, "no vertex below the belt"
    print("OK: conveyor belt + dragged sphere carry the cloth")
    return mean_vx


if __name__ == "__main__":
    main()
