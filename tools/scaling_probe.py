"""Multi-device scaling instrumentation (VERDICT r2 Missing #5).

Real multi-chip hardware is unavailable here, so this measures the WEAK-
SCALING overhead of the full training step (collect + PPO update with
its global advantage-norm / KL psums) over an N-virtual-device CPU mesh:
per-iteration wall time at fixed per-device env count for mesh sizes
1/2/4/8. On virtual CPU devices the collectives are memcpy-class, so the
efficiency number bounds the *code-path* overhead (sharding, collective
scheduling, per-device dispatch), not ICI bandwidth — the quantity this
host can measure. Emits logs/scaling_rN.json.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python tools/scaling_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/dwbc_jax"))

import numpy as np

from dwbc_tpu.parallel import mesh as mesh_lib
from dwbc_tpu.rl import ppo as ppo_lib
from dwbc_tpu.rl.runner import OnPolicyRunner
from dwbc_tpu.envs import legged_config as lc
from dwbc_tpu.envs.legged_robot import LeggedRobotEnv

PER_DEV_ENVS = int(os.environ.get("SCALE_ENVS_PER_DEV", "32"))
ITERS = int(os.environ.get("SCALE_ITERS", "8"))

results = {}
for ndev in (1, 2, 4, 8):
    devs = jax.devices()[:ndev]
    mesh = jax.sharding.Mesh(np.asarray(devs), ("data",))
    env = LeggedRobotEnv(lc.go1_flat(), num_envs=PER_DEV_ENVS * ndev, seed=1)
    cfg = ppo_lib.PPOConfig(
        num_heads=1, use_dagger=False, use_roa=False,
        num_learning_epochs=2, num_mini_batches=2,
        min_policy_std=(0.0,) * 12)
    runner = OnPolicyRunner(env, cfg, num_steps_per_env=8, seed=1, mesh=mesh)
    runner.learn(2, log_every=100)          # compile
    t0 = time.perf_counter()
    runner.learn(ITERS, log_every=100)
    dt = (time.perf_counter() - t0) / ITERS
    results[str(ndev)] = {
        "envs": PER_DEV_ENVS * ndev,
        "iter_s": round(dt, 4),
        "env_steps_per_s": round(PER_DEV_ENVS * ndev * 8 / dt, 1),
    }
    print(f"ndev={ndev} iter={dt*1e3:.1f} ms "
          f"({results[str(ndev)]['env_steps_per_s']:.0f} steps/s)", flush=True)

base = results["1"]["iter_s"]
for ndev in (2, 4, 8):
    r = results[str(ndev)]
    # LOWER BOUND ONLY: the N virtual devices share this host's few
    # physical cores, so most of the slowdown is core oversubscription,
    # not sharding/collective overhead. Real efficiency needs real chips.
    r["oversubscribed_weak_scaling_lower_bound"] = round(base / r["iter_s"], 3)

out = {"per_device_envs": PER_DEV_ENVS, "steps_per_env": 8,
       "physical_cpu_cores": os.cpu_count(),
       "note": ("virtual CPU mesh sharing os.cpu_count() physical cores: "
                "validates the sharded code path and bounds overhead from "
                "below; NOT an ICI-scaling measurement"),
       "results": results}
os.makedirs("logs", exist_ok=True)
with open("logs/scaling_r03.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
