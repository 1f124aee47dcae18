"""Two-way coupling closed loop: a rigid ball bouncing on a trampoline.

`contact_impulses` reports the impulse J (= Σ mᵢΔvᵢ, predicted one
substep ahead) the contact resolve applies to the soft body; the
reaction on the rigid collider is -J.  This demo closes the loop the way
a game engine would, as a *momentum-conserving impulse exchange at
substep granularity*::

    v_ball += g·dt;  c += v_ball·dt          # kinematic ball predict
    move_colliders(centers=c, velocities=v_ball)
    J = contact_impulses(...)["spheres"][0]  # the resolve step() will do
    v_ball -= J / m_ball                     # reaction, no force fudge
    step(..., n_substeps=1)

Ordering matters: the ball moves FIRST so J measures the very resolve
the substep applies.  For sustained contact J ≈ (supported weight)·dt
per substep, so the resting ball's gravity cancels exactly; at impact J
is the true collision impulse (bounded by approach speed) — no 1/dt
spikes.  (A frame-granularity variant that converts J to a force -J/dt
and holds it for 16 substeps overcounts impact impulses 16x and
catapults the ball — measured; don't do that.)  The ball dents the
pinned-edge cloth, is thrown back up, and settles with the trampoline
supporting its weight to a few percent.
Run: python examples/16_trampoline_coupling.py
"""

import numpy as np

import softbodyunity_tpu as sb
from softbodyunity_tpu import CollisionParams, SimConfig, SpringParams


def main(n_substeps: int = 2400, n: int = 16, check_settle: bool = True):
    """check_settle=False skips the settled-weight assertion for short
    CI runs that end mid-bounce."""
    cfg = SimConfig(
        springs=SpringParams(k_structural=4000.0, k_shear=2000.0,
                             k_bend=800.0, damping=1.5),
        collision=CollisionParams(enable_plane=False, enable_spheres=True,
                                  friction=0.2),
        global_damping=0.8,
    )
    spacing = 1.0 / (n - 1)
    host = sb.cloth_grid(
        n, n, spacing=spacing, mass=0.08,
        pinned=("top", "bottom", "left", "right"),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-10.0,
        orientation="xz",
        sphere_centers=[[0.5, 0.45, 0.5]], sphere_radii=[0.25],
    )
    top, state = sb.init(host)

    m_ball = 0.5
    dt = cfg.dt
    g = np.asarray([0.0, -9.81, 0.0])
    c = np.asarray([0.5, 0.45, 0.5])
    v_ball = np.zeros(3)

    min_y, max_rebound = c[1], -9.0
    support = 0.0
    settle = max(n_substeps // 6, 1)
    for i in range(n_substeps):
        v_ball = v_ball + g * dt
        c = c + v_ball * dt
        top = sb.move_colliders(
            top, sphere_centers=np.asarray([c], np.float32),
            sphere_velocities=np.asarray([v_ball], np.float32),
        )
        j = np.asarray(sb.contact_impulses(top, cfg, state)["spheres"][0])
        v_ball = v_ball - j / m_ball
        state = sb.step(top, cfg, state, n_substeps=1)
        min_y = min(min_y, c[1])
        if i > n_substeps // 4:
            max_rebound = max(max_rebound, v_ball[1])
        if i >= n_substeps - settle:              # settled window
            support += -j[1] / dt / settle

    x = np.asarray(state.x)
    assert np.isfinite(x).all() and np.isfinite(c).all()
    weight = m_ball * 9.81
    print(f"lowest ball center {min_y:+.3f}; best upward speed after the "
          f"first bounce {max_rebound:+.2f} m/s; settled support "
          f"{support:.2f} N (weight {weight:.2f} N)")
    # the trampoline caught the ball well above the distant floor...
    assert min_y > -0.8
    # ...threw it back upward...
    assert max_rebound > 0.3
    # ...and finally supports its weight through the contact impulses
    if check_settle:
        assert abs(support - weight) < 0.15 * weight
    print("OK: rigid ball coupled both ways through contact_impulses")
    return support / weight


if __name__ == "__main__":
    main()
