"""Volumetric soft-body cube dropping onto the ground (BASELINE.json:10):
tet-mesh edge springs + volume preservation, exported as OBJ surface frames.

    python examples/04_softbody_cube.py [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import softbodyunity_tpu as sb
from softbodyunity_tpu.utils import meshio, profiling


def main(out_dir="/tmp/cube_demo", n_frames=120):
    os.makedirs(out_dir, exist_ok=True)
    host, cfg = sb.presets.build("softbody_cube")
    top, state = sb.init(host)
    for frame in range(n_frames):
        state = sb.step(top, cfg, state)
        if frame % 15 == 0:
            meshio.write_obj(f"{out_dir}/cube_{frame:03d}.obj", top, state)
    print(f"wrote {out_dir}/cube_*.obj")
    print("diagnostics:", profiling.diagnostics(top, cfg, state))


if __name__ == "__main__":
    main(*sys.argv[1:])
