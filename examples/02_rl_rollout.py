"""1024-scene batched RL rollout with a toy policy (BASELINE.json:11):
zero host round-trips inside the rollout — the policy is traced into the
on-device scan.

    python examples/02_rl_rollout.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

import softbodyunity_tpu as sb
from softbodyunity_tpu.parallel.rl import EnvSpec, BatchedClothEnv
from softbodyunity_tpu import api


def main(batch=1024, n_frames=30):
    host, cfg = sb.presets.build("cloth_batch_rl")
    top, rest = api.init(host)
    spec = EnvSpec(handle_ids=(240, 255), obs_ids=tuple(range(0, 256, 16)),
                   batch=batch)
    env = BatchedClothEnv(top, cfg, rest, spec)

    def policy(obs):                             # lift the free corners
        return jnp.full(env.action_shape, 2.0) * jnp.array([0.0, 1.0, 0.0])

    states, obs = env.rollout(jax.random.PRNGKey(0), policy, n_frames=n_frames)
    print("rollout done:", states.x.shape, "obs", obs.shape,
          "mean height", float(states.x[..., 1].mean()))


if __name__ == "__main__":
    main()
