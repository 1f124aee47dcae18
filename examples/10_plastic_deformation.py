"""Plastic deformation: a hanging cloth strained past its yield point
creeps permanently longer — remove the load (zero gravity) and it keeps
the stretched shape instead of springing back.

Rest-length scale is dynamic state (``State.rest_scale`` f32[E]), so the
topology never changes shape and plasticity stays jit/vmap/scan-friendly.
Run: python examples/10_plastic_deformation.py
"""

import dataclasses

import numpy as np

import softbodyunity_tpu as sb
from softbodyunity_tpu import PlasticityParams, SimConfig, SpringParams


def main(n_frames: int = 60, nx: int = 12, ny: int = 16):
    cfg = SimConfig(
        springs=SpringParams(k_structural=300.0, k_shear=150.0,
                             k_bend=60.0, damping=0.4),
        plasticity=PlasticityParams(enabled=True, yield_strain=0.02,
                                    creep=0.2),
        global_damping=0.3,
    )
    host = sb.cloth_grid(
        nx, ny, spacing=0.05, shear=True, bend=True, pinned=("top",),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-5.0,
        orientation="xy",
    )
    top, state = sb.init(host)

    # load phase: gravity strains the upper springs past the yield point
    for _ in range(n_frames):
        state = sb.step(top, cfg, state)
    scale = np.asarray(state.rest_scale)
    y_loaded = float(np.asarray(state.x)[:, 1].min())
    print(f"loaded: max rest-scale {scale.max():.3f} "
          f"({(scale > 1.001).sum()} edges flowed), lowest y {y_loaded:+.3f}")

    # unload phase: zero gravity — elastic stretch recovers, plastic stays
    cfg_free = dataclasses.replace(cfg, gravity=(0.0, 0.0, 0.0))
    for _ in range(n_frames):
        state = sb.step(top, cfg_free, state)
    y_rest = float(np.asarray(state.x)[:, 1].min())
    drop0 = -0.05 * (ny - 1)  # unstretched hanging depth
    print(f"unloaded: lowest y {y_rest:+.3f} vs original rest {drop0:+.3f} "
          f"-> permanent set {drop0 - y_rest:+.3f}")
    assert np.isfinite(np.asarray(state.x)).all()
    assert scale.max() > 1.001
    return float(scale.max())


if __name__ == "__main__":
    main()
