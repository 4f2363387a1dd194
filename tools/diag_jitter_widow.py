"""Widow standing-jitter isolation (TPU): baseline / contact-gain x0.5 /
soft leg gains / flat terrain."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/dwbc_jax"))

from dwbc_tpu.envs.config import TerrainCfg, WidowGo1Cfg
from dwbc_tpu.envs.widowgo1 import WidowGo1Env
from dwbc_tpu.sim import engine, fused

N = 256


def run(env, label, n=120, tail=60):
    state, obs = env.reset(jax.random.PRNGKey(0))
    zeros = jnp.zeros((N, env.num_actions))
    qds, taus = [], []
    for t in range(n):
        state, out = env.step(state, zeros, jnp.asarray(1e9))
        if t >= tail:
            qds.append(np.asarray(state.robot.qd[:, 6:18]))
            taus.append(np.asarray(state.torques[:, :12]))
    qd = np.stack(qds)
    tau = np.stack(taus)
    e = float((np.sum((tau * qd) ** 2, -1)).mean())
    print(f"{label:28s} legvel RMS {np.sqrt((qd**2).mean()):.4f} rad/s  "
          f"energy raw/step {e:9.1f}  z {np.asarray(state.robot.q[:,2]).mean():.3f}",
          flush=True)


env = WidowGo1Env(WidowGo1Cfg(), num_envs=N, seed=1)
run(env, "baseline")

# contact gain x0.5
env2 = WidowGo1Env(WidowGo1Cfg(), num_envs=N, seed=1)
ctx2 = engine.PhysCtx(m_solo=env2.ctx.m_solo * 0.5,
                      m_body=env2.ctx.m_body * 0.5,
                      dof_i_eff=env2.ctx.dof_i_eff)
bs = WidowGo1Cfg().box.box_size
env2.fused_step = fused.make_fused_substep(
    env2.model, env2.sim_params, env2.hf, ctx2,
    np.asarray(env2.feet_geoms), box_half_extents=(bs / 2,) * 3)
run(env2, "contact gain x0.5")

# flat terrain
cfg3 = dataclasses.replace(WidowGo1Cfg(), terrain=TerrainCfg(mesh_type="plane"))
env3 = WidowGo1Env(cfg3, num_envs=N, seed=1)
run(env3, "flat terrain")

# soft leg gains (go1-style 20/0.5)
cfg4 = WidowGo1Cfg()
ctrl = dataclasses.replace(
    cfg4.control,
    stiffness=tuple([20.0] * 12 + list(cfg4.control.stiffness[12:])),
    damping=tuple([0.5] * 12 + list(cfg4.control.damping[12:])))
cfg4 = dataclasses.replace(cfg4, control=ctrl)
env4 = WidowGo1Env(cfg4, num_envs=N, seed=1)
run(env4, "leg gains 20/0.5")
