"""PNG preview renderer (utils/render.py) + terrain_mesh (the Unity
Terrain analogue): watertightness, render output, example pipeline."""

import os

import numpy as np

import softbodyunity_tpu as sb


def _edge_counts(tris):
    cnt = {}
    for a, b, c in np.asarray(tris, np.int64):
        for u, v in ((a, b), (b, c), (c, a)):
            key = (min(u, v), max(u, v))
            cnt[key] = cnt.get(key, 0) + 1
    return cnt


def test_terrain_mesh_is_watertight_outward():
    rng = np.random.default_rng(0)
    h = rng.uniform(0.0, 0.3, (6, 9))
    pos, tris = sb.terrain_mesh(h, spacing=0.1, base_depth=0.2)
    assert pos.shape == (2 * 6 * 9, 3)
    # closed: every undirected edge on exactly 2 triangles
    assert set(_edge_counts(tris).values()) == {2}
    # outward winding: positive enclosed volume, roughly the block volume
    from softbodyunity_tpu.core.topology import _signed_volume

    v = _signed_volume(pos, tris)
    footprint = 0.8 * 0.5                      # (W-1)(H-1) spacing^2
    assert v > footprint * 0.2                 # base depth alone is 0.2
    # the closedness validator agrees (terrain as a pressure body works)
    host = sb.from_triangle_mesh(pos, tris)
    sb.enable_pressure(host)


def test_render_frame_writes_png(tmp_path):
    host, cfg = sb.presets.build("cloth_32_euler")
    top, state = sb.init(host)
    state = sb.step(top, cfg, state)
    p = tmp_path / "frame.png"
    sb.render_frame(top, state, str(p))
    assert p.exists() and p.stat().st_size > 5000


def test_render_rollout_sequence(tmp_path):
    host, cfg = sb.presets.build("cloth_32_euler")
    top, state = sb.init(host)
    _, written = sb.render_rollout(top, cfg, state, 4, str(tmp_path), every=2)
    assert written == 2
    assert (tmp_path / "frame_0001.png").exists()
