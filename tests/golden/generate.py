"""Generate golden trajectories (SURVEY.md §4): the float64 oracle rolled
100 frames on every workload preset, positions recorded every 10 frames.

Run from the repo root:  python tests/golden/generate.py

The .npz files are the standing "reference trajectories at fixed dt"
(BASELINE.json:5) — regenerate ONLY when the binding physics semantics in
oracle/reference.py deliberately change.
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from softbodyunity_tpu.models import presets  # noqa: E402
from softbodyunity_tpu.oracle import reference as oracle  # noqa: E402

N_STEPS = 100
RECORD_EVERY = 10
OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def main():
    for name in presets.names():
        host, cfg = presets.build(name)
        if host.positions0.shape[0] > 4096:
            continue  # too big for a checked-in golden; covered by invariants
        if cfg.self_collision.enabled:
            # oracle implements the dense pair rule (== hash/dense_mxu)
            cfg = cfg.replace(
                self_collision=dataclasses.replace(cfg.self_collision, method="dense")
            )
        traj = oracle.run_trajectory(host, cfg, N_STEPS, record_every=RECORD_EVERY)
        path = os.path.join(OUT_DIR, f"{name}.npz")
        np.savez_compressed(
            path,
            positions=traj.astype(np.float32),
            n_steps=N_STEPS,
            record_every=RECORD_EVERY,
        )
        print(f"{name}: {traj.shape} -> {path}")


if __name__ == "__main__":
    main()
