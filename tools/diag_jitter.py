"""Isolate the standing joint-velocity jitter source (go1, CPU).

Variants: baseline; contact effective-mass (correction gain) x0.5;
joint dry friction off; limit torques off. Whichever kills the jitter
names the oscillator.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/dwbc_jax"))
import jax.numpy as jnp
import numpy as np

from dwbc_tpu.envs import legged_config as lc
from dwbc_tpu.envs.legged_robot import LeggedRobotEnv
from dwbc_tpu.sim import dynamics, engine, fused
from dwbc_tpu.terrain import terrain as terr

cfg = lc.go1_flat()
env = LeggedRobotEnv(cfg, num_envs=1, seed=1)
m = env.model
q0 = np.zeros(m.nq)
q0[2] = 0.42
q0[6] = 1.0
q0[7:] = np.asarray(env.default_dof_pos)
default = jnp.asarray(env.default_dof_pos)
inert = dynamics.default_inertial(m)
mass = inert.mass[None]
com = inert.com[None]
inertia = inert.inertia[None]
fric = jnp.ones((1,))


def run(step_fn, label, n=400, tail=100):
    q = jnp.asarray(q0)[None]
    qd = jnp.zeros((1, m.nv))
    cc = fused.init_contact_carry(m, 1)

    @jax.jit
    def one(q, qd, cc):
        def tau_fn(carry, q_arr, qd_arr):
            tau = (env.p_gains * (default - q_arr[:, 7:])
                   - env.d_gains * qd_arr[:, 6:])
            return carry, jnp.clip(tau, -env.torque_limits, env.torque_limits)
        out, _ = step_fn(q, qd, tau_fn, mass, com, inertia, fric, 1,
                         contact_carry=cc)
        return out.q, out.qd, out.contact_carry

    qs, qds = [], []
    for t in range(n):
        q, qd, cc = one(q, qd, cc)
        qs.append(np.asarray(q[0]))
        qds.append(np.asarray(qd[0]))
    qdt = np.stack(qds)[-tail:, 6:]
    print(f"{label:34s} joint-vel RMS {np.sqrt((qdt**2).mean()):.4f} rad/s"
          f"  base z {np.stack(qs)[-tail:,2].mean():.4f}")


print("== baseline ==")
run(env.fused_step, "baseline")

# variant: halve the contact correction gain (eff masses x0.5)
ctx2 = engine.PhysCtx(m_solo=env.ctx.m_solo * 0.5,
                      m_body=env.ctx.m_body * 0.5,
                      dof_i_eff=env.ctx.dof_i_eff)
step2 = fused.make_fused_substep(m, env.sim_params, env.hf, ctx2,
                                 np.asarray(env.feet_geoms))
run(step2, "contact gain x0.5")

ctx3 = engine.PhysCtx(m_solo=env.ctx.m_solo * 0.25,
                      m_body=env.ctx.m_body * 0.25,
                      dof_i_eff=env.ctx.dof_i_eff)
step3 = fused.make_fused_substep(m, env.sim_params, env.hf, ctx3,
                                 np.asarray(env.feet_geoms))
run(step3, "contact gain x0.25")

# variant: no joint dry friction / damping torques
m_nofric = m.replace(dof_friction=np.zeros_like(np.asarray(m.dof_friction)),
                     dof_damping=np.zeros_like(np.asarray(m.dof_damping))) \
    if hasattr(m, "replace") else None
if m_nofric is not None:
    step4 = fused.make_fused_substep(m_nofric, env.sim_params, env.hf,
                                     env.ctx, np.asarray(env.feet_geoms))
    run(step4, "no joint dry friction/damping")

# variant: no limit springs
sp = env.sim_params._replace(limit_kp=0.0, limit_kd=0.0)
step5 = fused.make_fused_substep(m, sp, env.hf, env.ctx,
                                 np.asarray(env.feet_geoms))
run(step5, "no limit torques")
