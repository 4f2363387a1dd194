"""Diagnostic: go1 rough-terrain WITHOUT measured-height observations.
Separates 'heights obs pipeline hurts learning' from 'rough terrain or
its physics blocks walking' (r3: rough@4096 stalled at tracking 0.16
while flat learns)."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/dwbc_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from dwbc_tpu.envs import legged_config as lc
from dwbc_tpu.envs.legged_robot import LeggedRobotEnv
from dwbc_tpu.rl import ppo as ppo_lib
from dwbc_tpu.rl.runner import OnPolicyRunner
from dwbc_tpu.utils.task_registry import _BASE_PPO

cfg = lc.go1_rough()
cfg = dataclasses.replace(
    cfg, terrain=dataclasses.replace(cfg.terrain, measure_heights=False))
env = LeggedRobotEnv(cfg, num_envs=512, seed=1)
runner = OnPolicyRunner(env, _BASE_PPO, num_steps_per_env=24, seed=1,
                        log_dir="logs/rough_go1/r3_blind")
runner.learn(600, log_every=25)
