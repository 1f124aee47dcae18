"""Shape-matched jelly ball: Muller-style meshless deformation.

`enable_shape_matching` turns ANY built body into the classic Unity
"jelly" soft body: vertex clusters remember their rest shape, and every
substep each cluster is pulled toward the best-fit rigid transform of it
(`ShapeMatchParams`; oracle/reference.py::shape_match_dx is the binding
semantics — warm-started quaternion rotation extraction, Muller et al.
2016).  Unlike springs alone, the goal positions never overshoot, so the
body is unconditionally stable at any stiffness; unlike pressure bodies
it works on open meshes and solids too.  The ball below squashes on
impact and the cluster shape memory pulls it back round.
Run: python examples/26_jelly_ball.py
"""

import numpy as np

import softbodyunity_tpu as sb
from softbodyunity_tpu import CollisionParams, ShapeMatchParams, SimConfig, SpringParams


def main(n_frames: int = 150, subdivisions: int = 2):
    cfg = SimConfig(
        shape_match=ShapeMatchParams(enabled=True, stiffness=0.3),
        springs=SpringParams(k_structural=40.0, k_shear=20.0, k_bend=8.0,
                             damping=0.4),
        collision=CollisionParams(enable_plane=True, friction=0.3),
        global_damping=0.8,
    )
    pos, tris = sb.icosphere_mesh(
        radius=0.25, subdivisions=subdivisions, center=(0.0, 0.6, 0.0)
    )
    host = sb.from_triangle_mesh(
        pos, tris, mass=0.02, springs=cfg.springs, xpbd=cfg.xpbd,
        plane_height=0.0,
    )
    # two-ish clusters per 0.3-voxel: local shape memory (softer than one
    # whole-body cluster, which would behave almost rigidly)
    host = sb.enable_shape_matching(host, cell_size=0.3)

    top, state = sb.init(host)
    r0 = np.linalg.norm(
        np.asarray(state.x) - np.asarray(state.x).mean(0), axis=1
    ).mean()
    squash_min = 1.0
    for _ in range(n_frames):
        state = sb.step(top, cfg, state)
        x = np.asarray(state.x)
        c = x.mean(0)
        squash_min = min(
            squash_min,
            float(np.linalg.norm(x - c, axis=1).mean() / r0),
        )
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    r_end = float(np.linalg.norm(x - x.mean(0), axis=1).mean() / r0)
    print(f"mean radius vs rest: min during impact {squash_min:.2f}, "
          f"final {r_end:.2f}; resting height {x[:, 1].min():+.4f}")
    # impact squashed it, the shape memory pulled it back toward round
    assert r_end > 0.8, "jelly lost its shape"
    assert x[:, 1].min() > -1e-4, "sank below the floor"
    print("OK: jelly ball squashed on impact and recovered its shape")
    return r_end


if __name__ == "__main__":
    main()
