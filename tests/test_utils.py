"""Checkpoint/resume determinism, diagnostics, checkify guards, CLI
(SURVEY.md §5 auxiliary subsystems)."""

import json
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from softbodyunity_tpu import api
from softbodyunity_tpu.models import presets
from softbodyunity_tpu.utils import checkpoint, profiling


def test_checkpoint_resume_bit_identical(tmp_path):
    """Resume from a checkpoint replays the identical trajectory."""
    host, cfg = presets.build("cloth_32_euler")
    top, state = api.init(host)
    mid = api.step(top, cfg, state, n_substeps=32)
    path = str(tmp_path / "state.npz")
    checkpoint.save_state(path, mid)
    restored = checkpoint.load_state(path, mid)
    np.testing.assert_array_equal(np.asarray(restored.x), np.asarray(mid.x))
    end_a = api.step(top, cfg, mid, n_substeps=32)
    end_b = api.step(top, cfg, restored, n_substeps=32)
    np.testing.assert_array_equal(np.asarray(end_a.x), np.asarray(end_b.x))


def test_checkpoint_atomic_overwrite(tmp_path):
    host, cfg = presets.build("cloth_32_euler")
    top, state = api.init(host)
    path = str(tmp_path / "s.npz")
    checkpoint.save_state(path, state)
    s2 = api.step(top, cfg, state)
    checkpoint.save_state(path, s2)  # overwrite
    restored = checkpoint.load_state(path, state)
    np.testing.assert_array_equal(np.asarray(restored.x), np.asarray(s2.x))


def test_diagnostics_keys_and_sanity():
    host, cfg = presets.build("cloth_32_euler")
    top, state = api.init(host)
    state = api.step(top, cfg, state)
    d = profiling.diagnostics(top, cfg, state)
    assert d["kinetic_energy"] >= 0
    assert d["spring_energy"] >= 0
    assert np.isfinite(d["max_edge_residual"])


def test_cost_analysis_reports_flops():
    host, cfg = presets.build("cloth_32_euler")
    top, state = api.init(host)
    costs = profiling.cost_analysis(top, cfg, state, n_substeps=2)
    assert costs.get("flops", 0) > 0


def test_checked_step_passes_on_finite():
    host, cfg = presets.build("cloth_32_euler")
    top, state = api.init(host)
    out = profiling.checked_step(top, cfg, state, n_substeps=4)
    assert np.isfinite(np.asarray(out.x)).all()


def test_checked_step_raises_on_nan():
    host, cfg = presets.build("cloth_32_euler")
    top, state = api.init(host)
    bad = state.replace(x=state.x.at[0, 0].set(jnp.nan))
    with pytest.raises(Exception):
        profiling.checked_step(top, cfg, bad, n_substeps=2)


@pytest.mark.slow
def test_cli_runs_preset():
    out = subprocess.run(
        [sys.executable, "-m", "softbodyunity_tpu.bench", "cloth_32_euler",
         "--frames", "4"],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "PYTHONPATH": "/root/repo"},
    )
    assert out.returncode == 0, out.stderr[-500:]
    row = json.loads(out.stdout.strip().splitlines()[-1])
    assert row["preset"] == "cloth_32_euler"
    assert row["substeps_per_sec"] > 0


def test_orbax_checkpoint_roundtrip(tmp_path):
    """orbax backend (multi-host-ready) round-trips the state pytree."""
    host, cfg = presets.build("cloth_32_euler")
    top, state = api.init(host)
    mid = api.step(top, cfg, state, n_substeps=8)
    path = str(tmp_path / "orbax_ckpt")
    checkpoint.save_orbax(path, mid)
    restored = checkpoint.load_orbax(path, mid)
    np.testing.assert_array_equal(np.asarray(restored.x), np.asarray(mid.x))
    np.testing.assert_array_equal(np.asarray(restored.v), np.asarray(mid.v))


def test_api_rollout_records_trajectory():
    """api.rollout: n frames scanned on-device, per-frame positions out."""
    host, cfg = presets.build("cloth_32_euler")
    top, state = api.init(host)
    final, xs = api.rollout(top, cfg, state, n_steps=5, n_substeps=2)
    assert xs.shape == (5, 1024, 3)
    assert np.isfinite(np.asarray(xs)).all()
    # last recorded frame equals the final state
    np.testing.assert_array_equal(np.asarray(xs[-1]), np.asarray(final.x))
    # the cloth is actually falling across frames
    y_means = np.asarray(xs)[:, :, 1].mean(axis=1)
    assert (np.diff(y_means) < 0).all()
