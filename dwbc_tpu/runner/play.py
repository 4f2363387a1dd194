"""Policy evaluation / trajectory export.

Mirror of reference scripts/play.py: loads a checkpoint, runs a few envs
with the deployment-mode policy (history encoder replacing the
privileged encoder — actor_critic.py:204-217), and dumps state/command/
EE-goal trajectories to .npz for offline visualization (the viewer
replacement; the reference drew EE goal spheres live, widowGo1.py:
1110-1154).

Usage: python -m dwbc_tpu.runner.play --task widowGo1 --checkpoint path
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="widowGo1")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--num_envs", type=int, default=5)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--stochastic", action="store_true")
    ap.add_argument("--out", default="play_traj.npz")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from ..utils.task_registry import make_runner

    env, runner, spec = make_runner(args.task, num_envs=args.num_envs)
    if args.checkpoint:
        runner.load(args.checkpoint, load_optimizer=False)
    policy = runner.get_inference_policy(stochastic=args.stochastic)

    state, obs = env.reset(jax.random.PRNGKey(0))
    qs, cmds, goals, rews, ees, feet = [], [], [], [], [], []
    key = jax.random.PRNGKey(1)
    for t in range(args.steps):
        key, k = jax.random.split(key)
        actions = policy(obs, k) if args.stochastic else policy(obs)
        if hasattr(env, "curriculum"):  # widowGo1-family takes a counter
            state, out = env.step(state, actions, jnp.asarray(1e9))
        else:
            state, out = env.step(state, actions)
        obs = out.obs
        qs.append(np.asarray(state.robot.q))
        cmds.append(np.asarray(state.commands))
        if hasattr(state, "curr_ee_goal_cart"):
            goals.append(np.asarray(state.curr_ee_goal_cart))
            ees.append(np.asarray(env._ee_world(state.robot.q)[0]))
        feet.append(np.asarray(state.foot_forces))
        rews.append(np.asarray(out.rew))

    np.savez(args.out, q=np.stack(qs), commands=np.stack(cmds),
             ee_goal_cart=np.stack(goals) if goals else np.zeros(0),
             ee_pos=np.stack(ees) if ees else np.zeros(0),
             foot_forces=np.stack(feet),
             rew=np.stack(rews), dt=env.dt)
    print(f"wrote {args.out}: q {np.stack(qs).shape}, "
          f"mean reward {np.stack(rews).mean():.4f}")
    print(f"visualize with: python -m dwbc_tpu.runner.visualize {args.out}")


if __name__ == "__main__":
    main()
