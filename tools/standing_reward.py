"""Is standing alive net-positive per step for widowGo1? (the suicide-
policy calculus). Zero-action rollout; per-step leg/arm reward after the
settle transient, plus component sums."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/dwbc_jax"))

from dwbc_tpu.envs.config import WidowGo1Cfg
from dwbc_tpu.envs.widowgo1 import WidowGo1Env

N = 512
env = WidowGo1Env(WidowGo1Cfg(), num_envs=N, seed=1)
state, obs = env.reset(jax.random.PRNGKey(0))
zeros = jnp.zeros((N, env.num_actions))

rews, arms, lens, dones = [], [], [], []
sums_t0 = {k: np.asarray(v).copy() for k, v in state.episode_sums.items()}
for t in range(120):
    state, out = env.step(state, zeros, jnp.asarray(1e9))
    rews.append(float(out.rew.mean()))
    arms.append(float(out.arm_rew.mean()))
    dones.append(float(out.reset.mean()))

rews = np.asarray(rews)
arms = np.asarray(arms)
dones = np.asarray(dones)
print("per-step LEG reward:  settle(0-30) %.5f   standing(30-120) %.5f"
      % (rews[:30].mean(), rews[30:].mean()))
print("per-step ARM reward:  settle(0-30) %.5f   standing(30-120) %.5f"
      % (arms[:30].mean(), arms[30:].mean()))
print("per-step dones:       settle %.4f standing %.4f"
      % (dones[:30].mean(), dones[30:].mean()))
# component sums accumulated over the 120 steps (per env mean, raw scale)
print("episode_sums deltas (mean/env, PRE-/100 scale):")
for k, v in state.episode_sums.items():
    d = float(np.mean(np.asarray(v) - sums_t0[k]))
    if abs(d) > 1e-4:
        print(f"  {k:32s} {d:+.4f}")
