"""Batch consistency (SURVEY.md C14, §4): vmapped stepping of B identical
scenes matches B single steps (to reduction-reorder tolerance — XLA may
re-associate sums under vmap), and jittered batches stay finite."""

import numpy as np

import jax.numpy as jnp

from softbodyunity_tpu import api
from softbodyunity_tpu.models import presets
from softbodyunity_tpu.parallel import batch


def test_vmap_matches_single_scene():
    host, cfg = presets.build("cloth_batch_rl")
    top, state = api.init(host)
    B = 5
    states = batch.batch_state(state, B)
    states = batch.step_batched(top, cfg, states, n_substeps=2)
    single = api.step(top, cfg, state, n_substeps=2)
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(states.x[b]), np.asarray(single.x), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(states.v[b]), np.asarray(single.v), atol=1e-4
        )
    # all batch members are identical to each other (determinism across lanes)
    np.testing.assert_array_equal(np.asarray(states.x[0]), np.asarray(states.x[1]))


def test_batched_rollout_jittered_finite():
    host, cfg = presets.build("cloth_batch_rl")
    top, state = api.init(host)
    B = 8
    rng = np.random.default_rng(0)
    jitter = 0.01 * rng.standard_normal((B, 3)).astype(np.float32)
    states = batch.batch_state(state, B, jitter=jnp.asarray(jitter))
    out = batch.rollout_batched(top, cfg, states, n_steps=3, n_substeps=2)
    x = np.asarray(out.x)
    assert x.shape == (B,) + state.x.shape
    assert np.isfinite(x).all()
    # jittered scenes actually diverge from each other
    assert np.abs(x[0] - x[1]).max() > 0.0


def test_heterogeneous_sphere_colliders_per_scene():
    """Each batched scene carries its own sphere geometry: scenes with the
    sphere in the cloth's path deform around it; scenes with it far away
    match the no-contact trajectory."""
    import dataclasses

    from softbodyunity_tpu.models import presets as _p

    host, cfg = _p.build("cloth_hanging_sphere")
    top, state = api.init(host)
    B = 4
    states = batch.batch_state(state, B)
    centers = np.tile(np.asarray(top.sphere_centers)[None], (B, 1, 1)).astype(np.float32)
    radii = np.tile(np.asarray(top.sphere_radii)[None], (B, 1)).astype(np.float32)
    centers[2:] = 100.0  # scenes 2,3: sphere far away
    out = states
    for _ in range(30):
        out = batch.step_batched_hetero(top, cfg, out, centers, radii)
    x = np.asarray(out.x)
    # scenes 0,1 identical; scenes 2,3 identical; the two groups differ
    np.testing.assert_array_equal(x[0], x[1])
    np.testing.assert_array_equal(x[2], x[3])
    assert np.abs(x[0] - x[2]).max() > 1e-3
    # contact scenes keep vertices outside their sphere
    d = np.linalg.norm(x[0] - np.asarray(top.sphere_centers)[0], axis=1)
    assert d.min() >= float(top.sphere_radii[0]) - 1e-5


def test_step_sharded_carries_feature_state():
    """Batch-sharded stepping with tearing + plasticity: the per-edge
    feature planes shard on the batch axis and the result matches the
    unsharded batched step (previously the pinned out_shardings pytree
    had no feature fields, so sharded tearing batches broke)."""
    import jax
    from softbodyunity_tpu.core.config import (
        PlasticityParams, SimConfig, SpringParams, TearParams,
    )
    from softbodyunity_tpu.core.topology import cloth_grid
    from softbodyunity_tpu.parallel import sharding

    cfg = SimConfig(
        springs=SpringParams(k_structural=300.0, k_shear=150.0,
                             k_bend=60.0, damping=0.3),
        tear=TearParams(enabled=True, strain_limit=0.03),
        plasticity=PlasticityParams(enabled=True, yield_strain=0.02,
                                    creep=0.1),
        global_damping=0.1,
    )
    host = cloth_grid(
        8, 12, spacing=0.05, shear=True, bend=True, pinned=("top",),
        springs=cfg.springs, xpbd=cfg.xpbd, plane_height=-5.0,
        orientation="xy",
    )
    top, state = api.init(host)
    mesh = sharding.make_mesh(jax.devices()[:4])
    states_s = sharding.shard_batched_state(batch.batch_state(state, 8), mesh)
    top_r = sharding.replicate_topology(top, mesh)
    states_u = batch.batch_state(state, 8)
    for _ in range(40):
        states_s = sharding.step_sharded(top_r, cfg, states_s, mesh)
        states_u = batch.step_batched(top, cfg, states_u)
    assert states_s.edge_alive is not None
    assert states_s.rest_scale is not None
    assert float(jnp.sum(states_s.edge_alive[0])) < host.edges.shape[0]
    np.testing.assert_allclose(
        np.asarray(states_s.x), np.asarray(states_u.x), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(states_s.edge_alive), np.asarray(states_u.edge_alive)
    )
