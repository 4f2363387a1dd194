"""Headline benchmark: widowGo1 training throughput on one TPU chip.

Measures the reference's own metric, Perf/total_fps = steps_per_env *
num_envs / (collection_time + learn_time) (on_policy_runner.py:206, 220),
on the flagship whole-body task at DWBC_BENCH_ENVS envs (default 8192,
per BASELINE.md).

Prints ONE json line. vs_baseline is measured against a nominal 50,000
env-steps/s for the reference's IsaacGym widowGo1 configuration on an
A100-class GPU — the repo publishes no numbers (BASELINE.md), so this is
the commonly reported legged_gym-era magnitude for a ~5000-env
whole-body task; revise when a real measurement exists.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NOMINAL_REFERENCE_FPS = 50_000.0


def main():
    num_envs = int(os.environ.get("DWBC_BENCH_ENVS", 8192))
    steps = int(os.environ.get("DWBC_BENCH_STEPS", 40))
    iters = int(os.environ.get("DWBC_BENCH_ITERS", 3))

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dwbc_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from dwbc_tpu.envs.config import WidowGo1Cfg
    from dwbc_tpu.envs.widowgo1 import WidowGo1Env
    from dwbc_tpu.rl import ppo as ppo_lib
    from dwbc_tpu.rl.runner import OnPolicyRunner

    env = WidowGo1Env(WidowGo1Cfg(), num_envs=num_envs, seed=1)
    runner = OnPolicyRunner(env, ppo_lib.PPOConfig(),
                            num_steps_per_env=steps, seed=1)

    # warmup: compile both collect variants + both update paths
    runner.learn(2, log_every=1000)

    t0 = time.time()
    runner.learn(iters, log_every=1000)
    dt = time.time() - t0
    fps = steps * num_envs * iters / dt

    print(json.dumps({
        "metric": "widowGo1_train_total_fps",
        "value": round(fps, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(fps / NOMINAL_REFERENCE_FPS, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
