"""Contact-solver fidelity goldens vs MuJoCo (VERDICT r1 item 5).

The reference's physics is the closed Isaac Gym PhysX binary, so direct
trajectory goldens are impossible; instead the compiled RobotModel (same
tree, inertias, sphere collision geoms) is exported to MJCF and the SAME
scripted PD trajectories are run in our impulse-solver engine and in
MuJoCo's (independent, well-validated) solver. The tests bound the
divergence on contact-rich scenarios: drop-and-settle and a trot cycle.

MuJoCo's soft-constraint solver and our TGS-class impulse model are
different contact laws; the bounds assert behavioral equivalence (same
equilibrium height, same gait-scale body motion), not step-level
equality."""

import math

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax
import jax.numpy as jnp

from dwbc_tpu.core import urdf
from dwbc_tpu.envs import legged_config as lc
from dwbc_tpu.envs.legged_robot import LeggedRobotEnv, _resolve_by_name
from dwbc_tpu.sim import dynamics, engine, fused
from dwbc_tpu.terrain import terrain as terr


def _mat_to_quat_wxyz(R):
    """3x3 -> (w, x, y, z) for MJCF."""
    R = np.asarray(R, np.float64)
    t = np.trace(R)
    if t > 0:
        s = math.sqrt(t + 1.0) * 2
        w, x, y, z = 0.25 * s, (R[2, 1] - R[1, 2]) / s, \
            (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = math.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w, x, y, z = (R[2, 1] - R[1, 2]) / s, 0.25 * s, \
            (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = math.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w, x, y, z = (R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s, \
            0.25 * s, (R[1, 2] + R[2, 1]) / s
    else:
        s = math.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w, x, y, z = (R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s, \
            (R[1, 2] + R[2, 1]) / s, 0.25 * s
    return w, x, y, z


def robotmodel_to_mjcf(model, dt=0.005):
    """Emit an MJCF equivalent of the compiled RobotModel: same kinematic
    tree, joint frames, inertials, and sphere collision geoms."""
    inert = dynamics.default_inertial(model)
    mass = np.asarray(inert.mass)
    com = np.asarray(inert.com)
    I = np.asarray(inert.inertia)
    geom_pos = np.asarray(model.geom_pos)

    def geoms_xml(b):
        out = []
        for g in range(len(model.geom_body)):
            if int(model.geom_body[g]) != b:
                continue
            p = geom_pos[g]
            out.append(
                f'<geom type="sphere" size="{float(model.geom_radius[g])}" '
                f'pos="{p[0]} {p[1]} {p[2]}" friction="1 0.005 0.0001"/>')
        return "\n".join(out)

    def inertial_xml(b):
        c = com[b]
        ib = I[b]
        return (f'<inertial pos="{c[0]} {c[1]} {c[2]}" mass="{mass[b]}" '
                f'fullinertia="{ib[0,0]} {ib[1,1]} {ib[2,2]} '
                f'{ib[0,1]} {ib[0,2]} {ib[1,2]}"/>')

    children = [[] for _ in range(model.nb)]
    for b in range(1, model.nb):
        children[int(model.parent[b])].append(b)

    def body_xml(b):
        sub = "".join(body_xml(c) for c in children[b])
        if b == 0:
            return (f'<body name="b0" pos="0 0 0">'
                    f'<freejoint/>{inertial_xml(0)}{geoms_xml(0)}{sub}</body>')
        tp = np.asarray(model.tree_pos[b])
        w, x, y, z = _mat_to_quat_wxyz(model.tree_rot[b])
        ax = np.asarray(model.joint_axis[b])
        jt = "hinge" if int(model.joint_type[b]) == 0 else "slide"
        arm = float(model.dof_armature[b - 1])
        damp = float(model.dof_damping[b - 1])
        lo, hi = float(model.dof_lower[b - 1]), float(model.dof_upper[b - 1])
        rng = (f'limited="true" range="{lo} {hi}"'
               if hi > lo and jt == "hinge" and hi - lo < 12.0 else "")
        return (f'<body name="b{b}" pos="{tp[0]} {tp[1]} {tp[2]}" '
                f'quat="{w} {x} {y} {z}">'
                f'<joint name="j{b}" type="{jt}" axis="{ax[0]} {ax[1]} {ax[2]}" '
                f'armature="{arm}" damping="{damp}" {rng}/>'
                f'{inertial_xml(b)}{geoms_xml(b)}{sub}</body>')

    return f"""<mujoco>
  <compiler angle="radian"/>
  <option timestep="{dt}" gravity="0 0 -9.81"/>
  <worldbody>
    <geom type="plane" size="0 0 1" friction="1 0.005 0.0001"/>
    {body_xml(0)}
  </worldbody>
</mujoco>"""


def _run_mujoco(model, q0_xyzw, targets_fn, p_gains, d_gains, n_steps, dt):
    mj = mujoco.MjModel.from_xml_string(robotmodel_to_mjcf(model, dt))
    d = mujoco.MjData(mj)
    d.qpos[0:3] = np.asarray(q0_xyzw[0:3])
    x, y, z, w = q0_xyzw[3:7]
    d.qpos[3:7] = [w, x, y, z]
    d.qpos[7:] = np.asarray(q0_xyzw[7:])
    traj = []
    for t in range(n_steps):
        tgt = targets_fn(t)
        tau = (p_gains * (tgt - d.qpos[7:])
               - d_gains * d.qvel[6:])
        d.qfrc_applied[6:] = tau
        mujoco.mj_step(mj, d)
        traj.append(np.concatenate([d.qpos[:3].copy(), d.qpos[3:7].copy()]))
    return np.asarray(traj)


def _run_ours(env, q0, targets_fn, n_steps):
    model = env.model
    q = jnp.asarray(q0)[None]
    qd = jnp.zeros((1, model.nv))
    inert = dynamics.default_inertial(model)
    mass = jnp.tile(inert.mass[None], (1, 1))
    com = jnp.tile(inert.com[None], (1, 1, 1))
    inertia = jnp.tile(inert.inertia[None], (1, 1, 1, 1))
    fric = jnp.ones((1,))

    @jax.jit
    def step1(q, qd, cc, tgt):
        def tau_fn(carry, q_arr, qd_arr):
            tau = (env.p_gains * (tgt - q_arr[:, 7:])
                   - env.d_gains * qd_arr[:, 6:])
            return carry, jnp.clip(tau, -env.torque_limits,
                                   env.torque_limits)

        out, _ = env.fused_step(q, qd, tau_fn, mass, com, inertia, fric, 1,
                                contact_carry=cc)
        return out.q, out.qd, out.contact_carry

    cc = fused.init_contact_carry(model, 1)
    traj = []
    for t in range(n_steps):
        q, qd, cc = step1(q, qd, cc, jnp.asarray(targets_fn(t)))
        traj.append(np.asarray(q[0, :7]))
    return np.asarray(traj)


@pytest.fixture(scope="module")
def go1():
    cfg = lc.go1_flat()
    return LeggedRobotEnv(cfg, num_envs=1, seed=1)


def _initial_q(env):
    m = env.model
    q0 = np.zeros(m.nq)
    q0[2] = 0.42
    q0[6] = 1.0
    q0[7:] = np.asarray(env.default_dof_pos)
    return q0


def test_drop_and_settle_matches_mujoco(go1):
    """go1 dropped from 0.42 m under PD hold settles to the same standing
    height (the static-equilibrium golden, contact-rich on 4 feet)."""
    env = go1
    m = env.model
    q0 = _initial_q(env)
    default = np.asarray(env.default_dof_pos)
    pg = np.asarray(env.p_gains)
    dg = np.asarray(env.d_gains)
    n = 300  # 1.5 s @ 200 Hz

    ours = _run_ours(env, q0, lambda t: default, n)
    mjt = _run_mujoco(m, q0, lambda t: default, pg, dg, n, env.cfg.sim_dt)

    z_ours = ours[-50:, 2].mean()
    z_mj = mjt[-50:, 2].mean()
    # settled (not still falling/oscillating)
    assert ours[-50:, 2].std() < 0.01
    assert mjt[-50:, 2].std() < 0.01
    print(f"settle height ours={z_ours:.4f} mujoco={z_mj:.4f} "
          f"delta={abs(z_ours - z_mj)*1000:.1f} mm")
    assert abs(z_ours - z_mj) < 0.03, (z_ours, z_mj)
    # upright in both (quat w component; ours xyzw, mujoco returned wxyz)
    assert abs(ours[-1, 6]) > 0.98
    assert abs(mjt[-1, 3]) > 0.98


def test_trot_cycle_matches_mujoco(go1):
    """Scripted 2 Hz trot (diagonal legs in antiphase) for 1.5 s: both
    engines keep the robot up at gait-equivalent base height and bounded
    drift — the contact-rich moving-gait golden."""
    env = go1
    m = env.model
    q0 = _initial_q(env)
    default = np.asarray(env.default_dof_pos)
    pg = np.asarray(env.p_gains)
    dg = np.asarray(env.d_gains)
    dt = env.cfg.sim_dt
    n = 300

    # dof order: FL,FR,RL,RR x (hip, thigh, calf) resolved by name; build
    # diagonal-pair phase from names
    names = m.dof_names
    phase = np.zeros(12)
    for i, nm in enumerate(names):
        diag = ("FL" in nm or "RR" in nm)
        phase[i] = 0.0 if diag else math.pi

    def targets(t):
        s = np.sin(2 * math.pi * 2.0 * t * dt + phase)
        off = np.zeros(12)
        for i, nm in enumerate(names):
            if "thigh" in nm:
                off[i] = 0.2 * s[i]
            elif "calf" in nm:
                off[i] = -0.25 * s[i]
        return default + off

    ours = _run_ours(env, q0, targets, n)
    mjt = _run_mujoco(m, q0, targets, pg, dg, n, dt)

    z_ours = ours[100:, 2].mean()
    z_mj = mjt[100:, 2].mean()
    print(f"trot mean height ours={z_ours:.4f} mujoco={z_mj:.4f}; "
          f"xy drift ours={np.linalg.norm(ours[-1,:2]):.3f} "
          f"mujoco={np.linalg.norm(mjt[-1,:2]):.3f}")
    assert abs(z_ours - z_mj) < 0.05, (z_ours, z_mj)
    # both stay up (no fall) and drift stays gait-scale. Open-loop drift
    # direction/magnitude is chaotic and contact-law-dependent (MuJoCo's
    # soft contacts slip more than our TGS-class impulse law; measured
    # ~0.46 m vs ~0.09 m over 1.5 s) — the bound documents the divergence
    # envelope rather than asserting step-level equality.
    assert z_ours > 0.18 and z_mj > 0.18
    assert np.linalg.norm(ours[-1, :2] - mjt[-1, :2]) < 0.6
