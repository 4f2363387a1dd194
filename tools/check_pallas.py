"""TPU validation of the pallas fused-substep kernel: numerical parity
vs sim/fused.py and a wall-clock comparison at bench scale.

Run on a machine with a TPU: python tools/check_pallas.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/dwbc_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from dwbc_tpu.core import urdf
from dwbc_tpu.envs.config import WidowGo1Cfg
from dwbc_tpu.ops import pallas_substep as ps
from dwbc_tpu.sim import dynamics, engine, fused
from dwbc_tpu.terrain import terrain as terr

N = int(os.environ.get("N", 4096))
cfg = WidowGo1Cfg()
model = urdf.load_urdf(urdf.WIDOW_GO1_URDF, dof_order=urdf.WIDOW_GO1_DOF_ORDER,
                       armature=cfg.sim.armature)
hf = terr.flat_plane(60.0, 1.0)
default = jnp.asarray(cfg.init_state.default_joint_angles)
q_ref = (jnp.zeros(model.nq).at[6].set(1.0)
         .at[2].set(cfg.init_state.pos[2]).at[7:].set(default))
ctx = engine.build_ctx(model, q_ref)
params = engine.SimParams(dt=cfg.sim.dt,
                          contact=engine.contact_mod.ContactParams(dt=cfg.sim.dt))
feet = np.concatenate([model.geoms_of(f) for f in urdf.FEET_ORDER])

p_gains = jnp.asarray(cfg.control.stiffness)
d_gains = jnp.asarray(cfg.control.damping)
a_scale = jnp.asarray(cfg.control.action_scale)
t_lim = jnp.asarray(model.dof_effort)
pd = ps.PDParams(p_gains=tuple(np.asarray(p_gains)),
                 d_gains=tuple(np.asarray(d_gains)),
                 action_scale=tuple(np.asarray(a_scale)),
                 default_pos=tuple(np.asarray(default[:18])),
                 use_motor_strength=True, n_act=18)

key = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
q = jnp.tile(q_ref[None], (N, 1))
q = q.at[:, 7:].add(0.05 * jax.random.normal(k1, (N, model.nj)))
qd = 0.3 * jax.random.normal(k2, (N, model.nv))
actions = 0.5 * jax.random.normal(k3, (N, 18))
ms = jax.random.uniform(k4, (N, 18), minval=0.7, maxval=1.3)
inert = dynamics.default_inertial(model)
mass = jnp.tile(inert.mass[None], (N, 1))
com = jnp.tile(inert.com[None], (N, 1, 1))
inertia = jnp.tile(inert.inertia[None], (N, 1, 1, 1))
fric = jnp.ones((N,))
DEC = cfg.control.decimation

# --- XLA fused reference ---
fstep = fused.make_fused_substep(model, params, hf, ctx, feet)

def tau_fn(carry, q_arr, qd_arr):
    scaled = actions * ms * a_scale
    tau = p_gains * (scaled + default[None, :18] - q_arr[:, 7:25]) \
        - d_gains * qd_arr[:, 6:24]
    tau20 = jnp.concatenate([tau, jnp.zeros((N, 2))], -1)
    return carry, jnp.clip(tau20, -t_lim, t_lim)

@jax.jit
def run_fused(q, qd):
    out, _ = fstep(q, qd, tau_fn, mass, com, inertia, fric, DEC)
    return out

t0 = time.time()
ref = jax.block_until_ready(run_fused(q, qd))
print(f"fused compile+run: {time.time()-t0:.1f}s", flush=True)

# --- pallas kernel ---
kstep = ps.make_pallas_step(model, params, hf, ctx, feet, pd, n_substeps=DEC)

@jax.jit
def run_pallas(q, qd):
    th, tn = ps.sample_terrain_cache(model, hf, q)
    return kstep(q, qd, actions, ms, mass, com, fric, th, tn)

t0 = time.time()
out = jax.block_until_ready(run_pallas(q, qd))
print(f"pallas compile+run: {time.time()-t0:.1f}s", flush=True)
q2, qd2, foot, tau, bodyf = out

def err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.max(np.abs(a - b)))

print(f"max|dq|   = {err(q2, ref.q):.2e}")
print(f"max|dqd|  = {err(qd2, ref.qd):.2e}")
print(f"max|dtau| = {err(tau, ref.torques):.2e}")
print(f"max|dfoot|= {err(foot, ref.foot_forces):.2e}")

# --- timing (20 steps each) ---
for name, fn in [("fused", lambda: run_fused(q, qd)),
                 ("pallas", lambda: run_pallas(q, qd))]:
    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(20):
        r = fn()
    jax.block_until_ready(r)
    dt = (time.time() - t0) / 20
    print(f"{name:6s}: {dt*1e3:7.2f} ms/policy-step @ {N} envs "
          f"({N*DEC/dt/1e6:.1f}M substeps/s)", flush=True)
