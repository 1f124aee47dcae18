"""Golden-trajectory replay (SURVEY.md §4, C17): the f32 device path must
track the stored float64 oracle trajectories (tests/golden/*.npz, generated
by tests/golden/generate.py) at every recorded frame.

Per-preset tolerances: smooth configs get tight bounds; contact-chaotic
configs (sphere contact, self-collision) amplify last-bit differences
exponentially and get correspondingly looser bounds over 100 frames —
their exactness is separately proven by the f64 parity tier
(tests/test_oracle_parity.py)."""

import dataclasses
import os

import numpy as np
import pytest

from softbodyunity_tpu import api
from softbodyunity_tpu.models import presets

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

TOLERANCES = {
    "cloth_32_euler": 1e-4,
    "softbody_cube": 1e-4,
    "cloth_xpbd": 2e-3,
    "cloth_hanging_sphere": 5e-2,   # sphere-contact chaos over 100 frames
    "cloth_batch_rl": 5e-2,         # self-collision contact chaos
    "curtain_stitched": 1e-4,       # merged bodies + stitch seams, smooth
    "balloon_drop": 5e-2,           # pressure body; plane-impact chaos
    "jelly_ball_drop": 5e-2,        # shape matching; plane-impact chaos
    "cloth_strain_limited": 5e-3,   # soft banner swings through the
    #                                 piecewise-linear clamp; f32 noise
    #                                 saturates ~1.6e-3 (measured), no
    #                                 growth; exactness is in the f64 tier
    "rope_swing": 1e-4,             # 1D chain, smooth (no contact)
}


def _replay(name: str, method: "str | None" = None):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    data = np.load(path)
    golden = data["positions"]            # [R, N, 3]
    record_every = int(data["record_every"])

    host, cfg = presets.build(name)
    if method is not None:
        cfg = cfg.replace(
            self_collision=dataclasses.replace(cfg.self_collision,
                                               method=method)
        )
    top, state = api.init(host)
    tol = TOLERANCES[name]
    for r in range(golden.shape[0]):
        for _ in range(record_every):
            state = api.step(top, cfg, state)
        drift = float(np.max(np.abs(np.asarray(state.x) - golden[r])))
        assert drift < tol, (
            f"{name}: drift {drift:.3e} > {tol} at frame {(r+1)*record_every}"
        )


@pytest.mark.parametrize("name", sorted(TOLERANCES))
def test_golden_replay(name):
    """Replay with each preset's SHIPPING config — cloth_batch_rl runs its
    production ``dense_mxu`` self-collision (round-3 VERDICT: the replay
    tier used to swap in ``dense`` and never touched the production
    method)."""
    _replay(name)


@pytest.mark.parametrize("method", ["dense", "block", "hash"])
def test_golden_replay_selfcollision_methods(method):
    """Every self-collision formulation replays the same golden
    trajectory: the methods are pair-set-identical (tests/test_hashgrid
    tier), so each must track the oracle within the contact-chaos
    bound."""
    _replay("cloth_batch_rl", method=method)
