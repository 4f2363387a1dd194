"""Torque-supervision on FROZEN real rollout data (VERDICT r4 item 3).

The fixed-synthetic-data unit test (tests/test_rl.py) shows the
supervision gradient path halves arm_torques_loss in 40 updates, yet the
live campaigns' loss drifts flat/up at ts_weight 1 and 10. This probe
separates the two remaining hypotheses on REAL data:

  * mechanism-on-real-data: collect ONE rollout from the adaptive task,
    freeze it, run repeated updates — if the loss falls, the optimizer
    can fit real OSC targets and the live drift is distribution
    nonstationarity (tumbling-state targets move as the policy moves);
  * if it does NOT fall, something in the real data (masking holes,
    permutation misalignment, target conditioning) blocks the fit.

Also prints the loss decomposition: masked fraction, target RMS,
prediction RMS.

Usage: python tools/ts_probe.py [--num_envs 256] [--updates 60]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=256)
    ap.add_argument("--updates", type=int, default=60)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dwbc_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    from dwbc_tpu.rl import ppo as ppo_lib
    from dwbc_tpu.rl.runner import OnPolicyRunner
    from dwbc_tpu.utils.task_registry import TASKS

    spec = TASKS["widowGo1_adaptive"]
    env = spec.make_env(args.num_envs, 1)
    cfg = spec.ppo_cfg._replace if hasattr(spec.ppo_cfg, "_replace") else None
    import dataclasses
    cfg = dataclasses.replace(spec.ppo_cfg,
                              torque_supervision_schedule=(1.0, 1e6, 1e6))
    runner = OnPolicyRunner(env, cfg, num_steps_per_env=40, seed=1)

    key = jax.random.PRNGKey(0)
    st, obs, traj, stats, nres = runner.rollout.collect(
        runner.ppo_state.params, runner.env_state, obs=runner.obs,
        counter=jnp.zeros(()), key=key, hist_encoding=False)
    returns, advs = ppo_lib.compute_gae(
        cfg, traj, runner.model.apply(runner.ppo_state.params, obs,
                                      method="evaluate"))

    tgt = np.asarray(traj.target_arm_torques)
    pos = np.asarray(traj.current_arm_dof_pos)
    vel = np.asarray(traj.current_arm_dof_vel)
    ok = (np.isfinite(tgt) & (np.abs(tgt) < 100.0)
          & np.isfinite(pos) & (np.abs(pos) < 1e3)
          & np.isfinite(vel) & (np.abs(vel) < 50.0))
    print(f"rollout: {tgt.size} samples, masked-in {ok.mean():.3f}, "
          f"target RMS (ok) {np.sqrt((tgt[ok]**2).mean()):.2f} Nm, "
          f"|target| p99 {np.percentile(np.abs(tgt[ok]), 99):.1f}")

    state = runner.ppo_state
    losses = []
    for i in range(args.updates):
        state, metrics = ppo_lib.update(
            cfg, runner.model, state, traj, returns, advs,
            jax.random.PRNGKey(7), arm_default=runner.rollout.arm_default)
        losses.append(float(metrics["arm_torques_loss"]))
        if i % 10 == 0 or i == args.updates - 1:
            print(f"update {i:3d}: arm_torques_loss {losses[-1]:.2f}")
    first, last = losses[0], losses[-1]
    print(f"VERDICT: {first:.1f} -> {last:.1f} "
          f"({'FALLS' if last < 0.7 * first else 'DOES NOT FALL'}) on "
          "frozen real data")


if __name__ == "__main__":
    main()
