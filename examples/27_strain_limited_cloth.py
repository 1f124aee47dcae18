"""Strain limiting: the production-cloth hard bound on stretch.

Soft springs drape beautifully but stretch like rubber under load;
cranking stiffness fights it at the cost of tiny stable timesteps.
`StrainLimitParams` (Provot 1995; oracle strain_limit_dx is binding)
keeps the soft springs AND bounds elongation: after integration,
Jacobi sweeps project every edge longer than rest*(1+max_stretch) back
to the bound.  The demo hangs the same soft banner twice — unlimited
it stretches >40%, limited it holds ~10%.
Run: python examples/27_strain_limited_cloth.py
"""

import numpy as np

import softbodyunity_tpu as sb
from softbodyunity_tpu import SimConfig, SpringParams, StrainLimitParams


def _max_strain(host, x):
    a, b = host.edges[:, 0], host.edges[:, 1]
    length = np.linalg.norm(x[b] - x[a], axis=1)
    return float(((length - host.rest_length) / host.rest_length).max())


def main(n_frames: int = 150, n: int = 16):
    springs = SpringParams(k_structural=25.0, k_shear=12.0, k_bend=5.0,
                           damping=0.5)
    limited = SimConfig(
        strain_limit=StrainLimitParams(enabled=True, max_stretch=0.1),
        springs=springs, global_damping=0.5,
    )
    unlimited = limited.replace(
        strain_limit=StrainLimitParams(enabled=False))
    host = sb.cloth_grid(
        n, n, spacing=0.06, mass=0.05, pinned=("top",), shear=True,
        bend=True, springs=springs, xpbd=limited.xpbd, plane_height=-50.0,
        orientation="xy",
    )
    strains = {}
    for name, cfg in (("limited", limited), ("unlimited", unlimited)):
        top, state = sb.init(host)
        for _ in range(n_frames):
            state = sb.step(top, cfg, state)
        x = np.asarray(state.x)
        assert np.isfinite(x).all()
        strains[name] = _max_strain(host, x)
        print(f"{name}: max strain {strains[name]:.3f}")
    assert strains["limited"] < 0.13, "limit not holding"
    assert strains["unlimited"] > 2.0 * strains["limited"]
    print("OK: the 10% strain limit holds where raw springs stretch "
          f"{strains['unlimited']:.0%}")
    return strains


if __name__ == "__main__":
    main()
