"""Diagnose the drop-and-settle height gap vs MuJoCo (VERDICT r3 item 1b).

Decomposes the base-height divergence into (a) foot-sphere penetration
depth in our solver and (b) joint-angle (PD sag) differences, and sweeps
contact parameters to find the stiffness that closes the gap.
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import jax
import jax.numpy as jnp

from dwbc_tpu.envs import legged_config as lc
from dwbc_tpu.envs.legged_robot import LeggedRobotEnv
from dwbc_tpu.sim import dynamics

from test_contact_golden import _run_mujoco, _initial_q

cfg = lc.go1_flat()
env = LeggedRobotEnv(cfg, num_envs=1, seed=1)
m = env.model
q0 = _initial_q(env)
default = np.asarray(env.default_dof_pos)
pg = np.asarray(env.p_gains)
dg = np.asarray(env.d_gains)
n = 300

mjt = _run_mujoco(m, q0, lambda t: default, pg, dg, n, env.cfg.sim_dt)
z_mj = mjt[-50:, 2].mean()
print(f"mujoco settle z = {z_mj:.4f}")

# our engine with full joint state dump
inert = dynamics.default_inertial(m)
mass = jnp.tile(inert.mass[None], (1, 1))
com = jnp.tile(inert.com[None], (1, 1, 1))
inertia = jnp.tile(inert.inertia[None], (1, 1, 1, 1))
fric = jnp.ones((1,))
tgt = jnp.asarray(default)


@jax.jit
def stepn(q, qd, cc):
    def tau_fn(carry, q_arr, qd_arr):
        tau = (env.p_gains * (tgt - q_arr[:, 7:]) - env.d_gains * qd_arr[:, 6:])
        return carry, jnp.clip(tau, -env.torque_limits, env.torque_limits)
    out, _ = env.fused_step(q, qd, tau_fn, mass, com, inertia, fric, 10,
                            contact_carry=cc)
    return out.q, out.qd, out.contact_carry


from dwbc_tpu.sim import fused
q = jnp.asarray(q0)[None]
qd = jnp.zeros((1, m.nv))
cc = fused.init_contact_carry(m, 1)
for t in range(n // 10):
    q, qd, cc = stepn(q, qd, cc)
q_np = np.asarray(q[0])
z_ours = q_np[2]
print(f"ours   settle z = {z_ours:.4f}  delta = {(z_mj - z_ours)*1000:.1f} mm")

# foot-sphere penetration in our final state
kin = dynamics.fk(m, q[0], qd[0])
gb = np.asarray(m.geom_body)
geom_pos = np.asarray(m.geom_pos)
radius = np.asarray(m.geom_radius)
pos = np.asarray(kin.pos)
rot = np.asarray(kin.rot)
pen = []
for g in range(len(gb)):
    p = pos[gb[g]] + rot[gb[g]] @ geom_pos[g]
    phi = p[2] - radius[g]
    if phi < 0.005:
        pen.append((g, int(gb[g]), float(phi)))
print("near-ground geoms (geom, body, phi):")
for row in pen:
    print("  ", row)

# joint-angle sag comparison: what base height would OUR joint angles give
# at zero penetration? FK from our q with z chosen so lowest foot touches.
q_lift = q_np.copy()
kin2 = dynamics.fk(m, jnp.asarray(q_lift), jnp.zeros(m.nv))
lowest = min(np.asarray(kin2.pos)[gb[g]][2]
             + (np.asarray(kin2.rot)[gb[g]] @ geom_pos[g])[2] - radius[g]
             for g in range(len(gb)))
print(f"our joint-sag-implied base height (zero pen): {q_np[2] - lowest:.4f}")

# mujoco joint angles at settle
import mujoco
from test_contact_golden import robotmodel_to_mjcf
mj = mujoco.MjModel.from_xml_string(robotmodel_to_mjcf(m, env.cfg.sim_dt))
d = mujoco.MjData(mj)
d.qpos[0:3] = q0[0:3]
x, y, z, w = q0[3:7]
d.qpos[3:7] = [w, x, y, z]
d.qpos[7:] = q0[7:]
for t in range(n):
    tau = pg * (default - d.qpos[7:]) - dg * d.qvel[6:]
    d.qfrc_applied[6:] = tau
    mujoco.mj_step(mj, d)
print("joint angle diff (ours - mujoco), per dof:")
print(np.round(q_np[7:] - d.qpos[7:], 4))
print("ours joints:", np.round(q_np[7:], 3))
print("mj   joints:", np.round(np.asarray(d.qpos[7:]), 3))
