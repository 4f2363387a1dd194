"""Deployment export: the save_jit.py equivalent.

The reference traces the bare Actor and StateHistoryEncoder with
torch.jit for the robot runtime (save_jit.py:196-236). Here we export:
  * flax msgpack weight dumps (actor + history encoder params);
  * StableHLO modules of the two pure functions via jax.export —
    actor(prop+latent) -> actions and hist_encoder(hist) -> latent,
    shapes matching the reference's traced inputs (save_jit.py:215-224).

Usage: python -m dwbc_tpu.runner.export --checkpoint path --out_dir dir
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="widowGo1")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out_dir", default="export")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ..utils.task_registry import make_runner

    env, runner, _ = make_runner(args.task, num_envs=1)
    runner.load(args.checkpoint, load_optimizer=False)
    params = runner.ppo_state.params
    model = runner.model
    os.makedirs(args.out_dir, exist_ok=True)

    # 1. weights
    with open(os.path.join(args.out_dir, "actor_critic.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))

    # 2. StableHLO exports (deployment-mode: history-encoder latent path)
    def policy_fn(obs):
        return model.apply(params, obs, True, method="act_mean")

    def hist_fn(obs):
        return model.apply(params, obs, method="hist_latent")

    # polymorphic batch dim: the robot runtime calls with batch 1, eval
    # playback with num_envs (reference traces batch-1, save_jit.py:215)
    b = jax.export.symbolic_shape("b")[0]
    obs_spec = jax.ShapeDtypeStruct((b, env.num_obs), jnp.float32)
    exp_policy = jax.export.export(jax.jit(policy_fn))(obs_spec)
    exp_hist = jax.export.export(jax.jit(hist_fn))(obs_spec)
    with open(os.path.join(args.out_dir, "policy.stablehlo"), "wb") as f:
        f.write(exp_policy.serialize())
    with open(os.path.join(args.out_dir, "hist_encoder.stablehlo"), "wb") as f:
        f.write(exp_hist.serialize())
    print(f"exported weights + StableHLO to {args.out_dir}")


if __name__ == "__main__":
    main()
