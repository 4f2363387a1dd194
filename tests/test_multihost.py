"""True multi-HOST validation (SURVEY.md §2.5.3): two OS processes join a
jax.distributed cluster (Gloo-backed CPU collectives), each builds ONLY its
env shard, and OnPolicyRunner trains over the assembled global batch. This
is the capability the reference never had (its only trace of distribution
is the dead --horovod flag, helpers.py:164)."""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; cache_dir = sys.argv[3]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
# FRESH per-run cache dir (shared by both workers), NOT the user cache:
# a stale persistent cache can hit for one worker and miss for the other
# (e.g. entries compiled under different machine features), skewing their
# compile times by minutes — more than the ~30 s Gloo context-connect
# deadline of the first collective. Symmetric cold compiles keep the two
# workers within seconds of each other.
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.device_count() == 4 and jax.process_count() == 2

# Establish the Gloo communicator NOW, while both processes are in
# lockstep (the preceding barrier of initialize): a tiny psum compiles in
# seconds on both sides; the big training graphs later reuse the
# connected clique instead of racing its 30 s connect deadline.
import numpy as np
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("dwbc_warmup")

from dwbc_tpu.parallel import distributed as dist
from dwbc_tpu.envs import legged_config as lc
from dwbc_tpu.envs.legged_robot import LeggedRobotEnv
from dwbc_tpu.rl import ppo as ppo_lib
from dwbc_tpu.rl.runner import OnPolicyRunner

mesh = dist.global_mesh()
env = LeggedRobotEnv(lc.go1_flat(), num_envs=8, seed=3)
cfg = ppo_lib.PPOConfig(
    num_heads=1, use_dagger=False, use_roa=False,
    num_learning_epochs=2, num_mini_batches=2,
    min_policy_std=(0.0,) * 12,
)
runner = OnPolicyRunner(env, cfg, num_steps_per_env=2, seed=1, mesh=mesh)
# per-host build path: local state shards were assembled, never the
# global batch on one host
assert runner.env_state.robot.q.shape[0] == 8
local_devs = [s.device for s in runner.env_state.robot.q.addressable_shards]
assert len(local_devs) == 2  # this host holds exactly its 2 devices' shards
runner.learn(2, log_every=1)
# params stay replicated and identical across hosts after the update
import numpy as np
leaf = np.asarray(
    jax.tree_util.tree_leaves(runner.ppo_state.params)[0].addressable_data(0))
print("MULTIHOST_OK", pid, float(np.abs(leaf).sum()), flush=True)
"""


def test_two_process_training(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    cache_dir = tmp_path / "jax_cache"
    cache_dir.mkdir()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), "29731",
                          str(cache_dir)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK {i}" in out, out[-2000:]
    # replicated params identical across hosts (same |params| checksum)
    sums = [out.split("MULTIHOST_OK")[-1].split()[1] for out in outs]
    assert sums[0] == sums[1], sums
