"""A flag on a pole fluttering in the wind: WindParams drag + lift
(normal-projected — the term that makes cloth billow) with the pole edge
pinned, plus api.move_pins waving the pole to show kinematic attachments.

Run: python examples/08_wind_flag.py
"""

import numpy as np

import softbodyunity_tpu as sb
from softbodyunity_tpu import SimConfig, SpringParams, WindParams


def main(n_frames: int = 120, nx: int = 24, ny: int = 16):
    cfg = SimConfig(
        springs=SpringParams(k_structural=600.0, k_shear=300.0,
                             k_bend=100.0, damping=0.5),
        wind=WindParams(velocity=(2.5, 0.3, 0.8), drag=0.25, lift=0.9),
        global_damping=0.2,
    )
    host = sb.cloth_grid(
        nx, ny, spacing=0.04, shear=True, bend=True, pinned=("left",),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-5.0,
        orientation="xy",
    )
    top, state = sb.init(host)
    pins = np.where(np.asarray(host.inv_mass) == 0.0)[0]
    pin0 = np.asarray(state.x)[pins]

    for frame in range(n_frames):
        # wave the pole gently (kinematic attachment)
        sway = 0.02 * np.sin(frame * 0.1)
        state = sb.move_pins(top, state, pin0 + np.array([0.0, 0.0, sway]),
                             pins)
        state = sb.step(top, cfg, state)
        if frame % 30 == 29:
            x = np.asarray(state.x)
            v = np.asarray(state.v)
            print(f"frame {frame + 1:3d}: downwind reach "
                  f"{x[:, 0].max():+.3f}, flutter |v|max {np.abs(v).max():.2f}")

    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    # the free edge streams downwind of the pole
    assert x[:, 0].max() > 0.5 * (nx - 1) * 0.04
    print("flag streams downwind; flutter is finite")
    return x


if __name__ == "__main__":
    main()
