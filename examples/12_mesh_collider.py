"""Mesh colliders: a cloth drapes over an arbitrary watertight mesh.

The Unity ``MeshCollider`` analogue ("plane/sphere collision resolve",
BASELINE.json:5, extended to arbitrary static geometry): the mesh is baked
ONCE on the host into a signed-distance grid (`core/sdf.py`), which the
solvers sample trilinearly per vertex — 8 scalar reads, O(N), shape-static,
no broad-phase and no host round-trips.  The bake here is a low-poly
"table" (a box), but any watertight triangle soup works the same way.
Run: python examples/12_mesh_collider.py
"""

import numpy as np

import softbodyunity_tpu as sb
from softbodyunity_tpu import CollisionParams, SimConfig
from softbodyunity_tpu.core.sdf import sdf_from_mesh
from softbodyunity_tpu.core.topology import add_colliders, cloth_grid


def _box_mesh(halves, center):
    """Watertight box: 8 vertices, 12 triangles."""
    hx, hy, hz = halves
    v = np.asarray(center, np.float64) + np.array(
        [[x, y, z] for x in (-hx, hx) for y in (-hy, hy) for z in (-hz, hz)]
    )
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
    ])
    return v, f


def main(n_frames: int = 150, n: int = 16, resolution: int = 32):
    cfg = SimConfig(
        collision=CollisionParams(
            enable_plane=True, enable_sdf=True,
            restitution=0.1, friction=0.3,
        ),
        global_damping=0.3,
    )
    half = (n - 1) * 0.05 / 2.0
    host = cloth_grid(
        n, n, spacing=0.05, shear=True, bend=True, pinned=(),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-2.0,
        origin=(-half, 0.32, -half), orientation="xz",
    )
    verts, tris = _box_mesh((0.55, 0.2, 0.55), (0.0, -0.2, 0.0))
    grid, origin, h = sdf_from_mesh(verts, tris, resolution=resolution)
    print(f"baked {tris.shape[0]}-triangle mesh -> SDF grid "
          f"{grid.shape} at spacing {h:.4f}")
    host = add_colliders(host, sdf_grids=grid, sdf_origins=[origin],
                         sdf_spacings=[h])

    top, state = sb.init(host)
    for _ in range(n_frames):
        state = sb.step(top, cfg, state)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    print(f"cloth y range [{x[:, 1].min():+.4f}, {x[:, 1].max():+.4f}] "
          "(table top at 0.0)")
    # resting ON the mesh, not through it (plane is far below at -2)
    assert x[:, 1].max() > -0.05

    # and the coupling surface sees the mesh supporting the cloth's weight
    imp = sb.contact_impulses(top, cfg, state)
    support = float(np.asarray(imp["sdfs"])[0, 1]) / cfg.dt
    weight = float((1.0 / np.asarray(top.inv_mass)).sum()) * 9.81  # no pins
    print(f"OK: mesh supports {support:.1f} N of cloth "
          f"(weight {weight:.1f} N)")
    return float(x[:, 1].max())


if __name__ == "__main__":
    main()
