"""Reproduce/diagnose the iter-0 reward explosion seen in bench.py.

Steps the widowGo1 env with untrained-policy-scale random actions and
reports per-term reward extremes + state extremes per step.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/dwbc_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from dwbc_tpu.envs.config import WidowGo1Cfg
from dwbc_tpu.envs.widowgo1 import WidowGo1Env

N = int(os.environ.get("N", 2048))
env = WidowGo1Env(WidowGo1Cfg(), num_envs=N, seed=1)
state, obs = env.reset(jax.random.PRNGKey(0))
key = jax.random.PRNGKey(1)

for t in range(40):
    key, k = jax.random.split(key)
    actions = jax.random.normal(k, (N, 18))  # std-1 untrained policy scale
    state, out = env.step(state, actions, jnp.zeros(()))
    rew = np.asarray(out.rew)
    arm = np.asarray(out.arm_rew)
    qd = np.asarray(state.robot.qd)
    q = np.asarray(state.robot.q)
    bad = int(np.argmin(rew))
    print(f"t={t:2d} rew[min,max]=({rew.min():.3e},{rew.max():.3e}) "
          f"arm[min]={arm.min():.3e} |qd|max={np.abs(qd).max():.3e} "
          f"zmin={q[:,2].min():.2f} zmax={q[:,2].max():.2f} "
          f"resets={int(np.asarray(out.reset).sum())}", flush=True)
    if rew.min() < -1e6:
        es = {k2: float(np.asarray(v)[bad]) for k2, v in
              state.episode_sums.items()}
        print("  worst env episode_sums:", es, flush=True)
        print("  worst env qd:", np.asarray(state.robot.qd)[bad].round(2),
              flush=True)
        break
