"""Two soft bodies interacting: a free cloth falls onto a pinned one.

Multi-body scenes need no special machinery here — a Topology is just
arrays, so two (or more) disconnected pieces concatenate into one scene
(`from_triangle_mesh` on the combined mesh), and the self-collision force
acts across ALL vertices, which between pieces IS body-body contact.
Run: python examples/11_two_cloths.py
"""

import numpy as np

import softbodyunity_tpu as sb
from softbodyunity_tpu import SelfCollisionParams, SimConfig, SpringParams


def _grid_mesh(n, spacing, y, z0=0.0):
    """Vertices + triangles of an n x n horizontal sheet at height y."""
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    verts = np.stack(
        [jj.ravel() * spacing, np.full(n * n, float(y)),
         z0 + ii.ravel() * spacing], axis=1,
    )
    tris = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            tris += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
    return verts, np.array(tris, np.int32)


def main(n_frames: int = 90, n: int = 10):
    spacing = 0.05
    cfg = SimConfig(
        springs=SpringParams(k_structural=40.0, k_shear=20.0,
                             k_bend=8.0, damping=0.15),
        # radius == rest spacing: zero force at the rest pose (adjacent
        # pairs sit exactly at the radius) but the contact shell spans the
        # whole sampling gap, so sheets cannot slip BETWEEN each other's
        # sample points — the failure mode of thinner vertex-vertex shells
        self_collision=SelfCollisionParams(
            enabled=True, method="dense", radius=1.0 * spacing,
            stiffness=800.0,
        ),
        global_damping=0.8,
    )
    # lower sheet pinned along its whole border (a trampoline); upper
    # sheet free, dropped from just above so it lands squarely
    v_low, t_low = _grid_mesh(n, spacing, y=0.0)
    v_up, t_up = _grid_mesh(n, spacing, y=0.08, z0=0.5 * spacing)
    verts = np.concatenate([v_low, v_up])
    tris = np.concatenate([t_low, t_up + n * n])
    border = tuple(
        i * n + j for i in range(n) for j in range(n)
        if i in (0, n - 1) or j in (0, n - 1)
    )
    # light vertices: contact repulsion (k*overlap) must beat per-vertex
    # weight and shed the impact momentum within the interaction depth,
    # or the falling sheet punches through
    host = sb.from_triangle_mesh(
        verts, tris, mass=0.02, pinned_ids=border, springs=cfg.springs,
        xpbd=cfg.xpbd,
    )
    host.plane_height = np.float64(-10.0)

    top, state = sb.init(host)
    for _ in range(n_frames):
        state = sb.step(top, cfg, state)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    low = x[: n * n]
    up = x[n * n:]
    gap = up[:, 1].min() - low[:, 1].max()
    print(f"upper sheet min y {up[:, 1].min():+.3f}, "
          f"lower sheet max y {low[:, 1].max():+.3f}")
    # the upper sheet came to rest ON the lower one, not through it (and
    # nowhere near the floor plane at -10)
    assert up[:, 1].min() > low[:, 1].min() - 0.02
    assert up[:, 1].min() > -0.5
    print(f"OK: two-body contact holds (vertical separation {gap:+.4f})")
    return float(gap)


if __name__ == "__main__":
    main()
