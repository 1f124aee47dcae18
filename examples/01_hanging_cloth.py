"""Hanging cloth draping over a sphere — the classic SoftbodyUnity demo
(BASELINE.json:8), exported as OBJ frames for any mesh viewer.

    python examples/01_hanging_cloth.py [out_dir]
"""

import sys

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import softbodyunity_tpu as sb
from softbodyunity_tpu.utils import meshio


def main(out_dir="/tmp/cloth_demo", n_frames=90):
    import os

    os.makedirs(out_dir, exist_ok=True)
    host, cfg = sb.presets.build("cloth_hanging_sphere")
    top, state = sb.init(host)
    for frame in range(n_frames):            # default 1.5 s at 60 fps
        state = sb.step(top, cfg, state)
        if frame % 10 == 0:
            meshio.write_obj(f"{out_dir}/frame_{frame:03d}.obj", top, state)
    print(f"wrote {out_dir}/frame_*.obj")


if __name__ == "__main__":
    main(*sys.argv[1:])
