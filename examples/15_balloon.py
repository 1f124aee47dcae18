"""Pressure soft body: a gas-filled balloon dropped on the ground.

`enable_pressure` turns a closed triangle shell into the classic Unity
"inflatable": the enclosed gas volume resists compression with ideal-gas
style pressure P ~ (inflation * V0 / V - 1), applied as per-face forces
P * A * n_hat (`PressureParams`; oracle/reference.py::pressure_forces is
the binding semantics).  The balloon squashes on impact, the gas pushes
back, and the rest shape recovers — without any tet mesh inside.
Run: python examples/15_balloon.py
"""

import numpy as np

import softbodyunity_tpu as sb
from softbodyunity_tpu import PressureParams, SimConfig, SpringParams


def main(n_frames: int = 150, subdivisions: int = 2):
    cfg = SimConfig(
        pressure=PressureParams(enabled=True, stiffness=400.0, inflation=1.1),
        springs=SpringParams(k_structural=200.0, k_shear=100.0, k_bend=40.0),
        global_damping=1.0,
    )
    pos, tris = sb.icosphere_mesh(
        radius=0.25, subdivisions=subdivisions, center=(0.0, 0.6, 0.0)
    )
    host = sb.from_triangle_mesh(
        pos, tris, mass=0.02, springs=cfg.springs, xpbd=cfg.xpbd,
        plane_height=0.0,
    )
    host = sb.enable_pressure(host)
    v0 = float(host.pressure_rest_volume[0])

    from softbodyunity_tpu.solver.pressure import body_volumes

    top, state = sb.init(host)
    v_min = v0
    for _ in range(n_frames):
        state = sb.step(top, cfg, state)
        v_min = min(v_min, float(body_volumes(top, state.x)[0]))
    x = np.asarray(state.x)
    v_end = float(body_volumes(top, state.x)[0])
    assert np.isfinite(x).all()
    print(f"rest volume {v0:.5f}; min during impact {v_min / v0:.2f} V0; "
          f"final {v_end / v0:.2f} V0; resting height {x[:, 1].min():+.4f}")
    # the gas brings the squashed balloon back to (at least) rest volume
    assert v_end > 0.9 * v0
    # and nothing sank below the floor
    assert x[:, 1].min() > -1e-4
    print("OK: balloon bounced, re-inflated, and rests on the plane")
    return v_end / v0


if __name__ == "__main__":
    main()
