"""Policy evaluation / trajectory export.

Mirror of reference scripts/play.py: loads a checkpoint, runs a few envs
with the deployment-mode policy (history encoder replacing the
privileged encoder — actor_critic.py:204-217), logs per-step state of
env 0 into `Logger` and renders the 3x3 diagnostic figure
(play.py:133-171, logger.py:86-151), and dumps state/command/EE-goal
trajectories to .npz for offline visualization (the viewer replacement;
the reference drew EE goal spheres live, widowGo1.py:1110-1154).

`--use_jit DIR` re-runs the serialized StableHLO deployment artifact
(from runner/export.py) instead of the live model — the reference's
jit-policy playback path (play.py:106-111, 127-131) — and verifies it
against the live model on the first batch.

Usage: python -m dwbc_tpu.runner.play --task widowGo1 --checkpoint path
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_jit_policy(export_dir):
    """Deserialize the StableHLO policy from runner/export.py — the
    deployment artifact itself, not the live flax model."""
    import jax

    with open(os.path.join(export_dir, "policy.stablehlo"), "rb") as f:
        exp = jax.export.deserialize(f.read())
    return lambda obs: exp.call(obs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="widowGo1")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--num_envs", type=int, default=5)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--stochastic", action="store_true")
    ap.add_argument("--use_jit", default=None, metavar="EXPORT_DIR",
                    help="play back the serialized StableHLO policy from "
                         "this export dir (validates the deployment "
                         "artifact end-to-end)")
    ap.add_argument("--out", default="play_traj.npz")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from ..utils.logger import Logger
    from ..utils.task_registry import make_runner

    env, runner, spec = make_runner(args.task, num_envs=args.num_envs)
    if args.checkpoint:
        runner.load(args.checkpoint, load_optimizer=False)
    policy = runner.get_inference_policy(stochastic=args.stochastic)

    state, obs = env.reset(jax.random.PRNGKey(0))

    if args.use_jit:
        if args.stochastic:
            raise SystemExit("--use_jit plays the deterministic actor")
        jit_policy = load_jit_policy(args.use_jit)
        # deployment-artifact proof: serialized module == live model
        live = np.asarray(policy(obs[:1]))
        exported = np.asarray(jit_policy(obs[:1]))
        err = float(np.abs(live - exported).max())
        print(f"use_jit: max |live - exported| on first obs = {err:.2e}")
        assert err < 1e-5, "exported StableHLO diverges from live model"
        policy = jit_policy

    logger = Logger(env.dt)
    default_dof = np.asarray(env.default_dof_pos)
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
        q = np.asarray(state.robot.q)
        qd = np.asarray(state.robot.qd)
        cmd = np.asarray(state.commands)
        act0 = np.asarray(actions[0])
        a_scale = getattr(env, "action_scale", None)
        scale0 = (np.asarray(a_scale) if a_scale is not None else 0.25)
        # per-step eval-state capture of env 0 (reference play.py:133-156)
        logger.log_states({
            "base_vel_x": qd[0, 0], "command_x": cmd[0, 0],
            "base_vel_y": qd[0, 1],
            "command_y": cmd[0, 1] if cmd.shape[1] > 1 else 0.0,
            "base_vel_yaw": qd[0, 5], "command_yaw": cmd[0, 2],
            "base_vel_z": qd[0, 2], "base_height": q[0, 2],
            "dof_pos": q[0, 7 + 1], "dof_pos_target": (
                np.atleast_1d(scale0 * act0)[min(1, act0.shape[0] - 1)]
                + default_dof[1]),
            "dof_vel": qd[0, 6 + 1],
            "dof_torque": np.asarray(state.torques)[0, 1],
            "contact_forces_z": np.asarray(state.foot_forces)[0, :, 2].max(),
        })
        qs.append(q)
        cmds.append(cmd)
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
    png = logger.plot_states(os.path.splitext(args.out)[0] + "_states.png")
    print(f"wrote {args.out}: q {np.stack(qs).shape}, "
          f"mean reward {np.stack(rews).mean():.4f}; diagnostics -> {png}")
    print(f"visualize with: python -m dwbc_tpu.runner.visualize {args.out}")


if __name__ == "__main__":
    main()
