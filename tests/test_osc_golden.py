"""OSC expert goldens vs MuJoCo on the widowGo1 model (VERDICT r2 item 4).

The arm OSC torque-supervision target (envs/widowgo1.py `_osc_target`,
reference widowGo1.py:1217-1242) is algebra over (arm mass-matrix block,
EE jacobian, gravity bias, FK). Each ingredient — and the assembled OSC
torque — is compared against MuJoCo computing the same quantities on the
same exported model (tree/inertials identical, robotmodel_to_mjcf)."""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax
import jax.numpy as jnp

from dwbc_tpu.core import maths, urdf
from dwbc_tpu.sim import dynamics

from test_contact_golden import robotmodel_to_mjcf


@pytest.fixture(scope="module")
def widow():
    model = urdf.load_urdf(urdf.WIDOW_GO1_URDF,
                           dof_order=urdf.WIDOW_GO1_DOF_ORDER)
    mj = mujoco.MjModel.from_xml_string(robotmodel_to_mjcf(model))
    return model, mj


def _rand_q(model, seed):
    rng = np.random.default_rng(seed)
    q = np.zeros(model.nq)
    q[0:3] = rng.normal(scale=0.3, size=3) + [0, 0, 0.4]
    quat = rng.normal(size=4)
    quat /= np.linalg.norm(quat)
    q[3:7] = quat  # xyzw
    lo = np.asarray(model.dof_lower)
    hi = np.asarray(model.dof_upper)
    span = np.clip(hi - lo, 0, 2.0)
    mid = np.clip((lo + hi) / 2, -1.5, 1.5)
    q[7:] = mid + rng.uniform(-0.4, 0.4, model.nj) * span / 4
    return q


def _mj_at(mj, q):
    d = mujoco.MjData(mj)
    d.qpos[0:3] = q[0:3]
    x, y, z, w = q[3:7]
    d.qpos[3:7] = [w, x, y, z]
    d.qpos[7:] = q[7:]
    d.qvel[:] = 0.0
    mujoco.mj_forward(mj, d)
    return d


ARM = slice(6 + 12, 6 + 18)  # waist..wrist_rotate dof columns


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_arm_mass_matrix_matches_mujoco(widow, seed):
    model, mj = widow
    q = _rand_q(model, seed)
    inert = dynamics.default_inertial(model)
    M = np.asarray(dynamics.crba(model, inert, jnp.asarray(q)))
    d = _mj_at(mj, q)
    Mfull = np.zeros((mj.nv, mj.nv))
    mujoco.mj_fullM(mj, d, Mfull)
    np.testing.assert_allclose(M[ARM, ARM], Mfull[ARM, ARM],
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_ee_jacobian_matches_mujoco(widow, seed):
    model, mj = widow
    q = _rand_q(model, seed)
    gripper = model.sites["wx250s/ee_gripper_link"].body
    offset = jnp.asarray(model.sites["wx250s/ee_gripper_link"].pos)
    J = np.asarray(dynamics.body_jacobian(model, jnp.asarray(q), gripper,
                                          offset))
    d = _mj_at(mj, q)
    kin = dynamics.fk(model, jnp.asarray(q), jnp.zeros(model.nv))
    p = np.asarray(kin.pos[gripper] + kin.rot[gripper] @ offset)
    jacp = np.zeros((3, mj.nv))
    jacr = np.zeros((3, mj.nv))
    mujoco.mj_jac(mj, d, jacp, jacr, p, gripper + 1)  # mj body 0 = world
    # joint columns are convention-independent (world-frame [lin; ang])
    np.testing.assert_allclose(J[:3, 6:], jacp[:, 6:], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(J[3:, 6:], jacr[:, 6:], rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_gravity_bias_matches_mujoco(widow, seed):
    model, mj = widow
    q = _rand_q(model, seed)
    inert = dynamics.default_inertial(model)
    bias = np.asarray(dynamics.rnea_bias(model, inert, jnp.asarray(q),
                                         jnp.zeros(model.nv)))
    d = _mj_at(mj, q)
    # qvel = 0 -> both are the generalized force the actuators must apply
    # to hold still (C qd + g); joint entries compare directly.
    np.testing.assert_allclose(bias[6:], d.qfrc_bias[6:],
                               rtol=1e-4, atol=1e-5)


def test_osc_torque_matches_mujoco_assembly(widow):
    """End-to-end: the OSC formula u = J^T Λ (kp dpose − kd v) + g_arm
    computed from OUR dynamics equals the same formula assembled from
    MuJoCo's M/J/bias on the same state (reference widowGo1.py:1230-1235)."""
    model, mj = widow
    q = _rand_q(model, 7)
    inert = dynamics.default_inertial(model)
    gripper = model.sites["wx250s/ee_gripper_link"].body
    offset = jnp.asarray(model.sites["wx250s/ee_gripper_link"].pos)
    kp = np.array([100.0] * 3 + [30.0] * 3)
    kd = 2.0 * np.sqrt(kp)
    dpose = np.asarray([0.05, -0.03, 0.08, 0.1, -0.05, 0.02])

    def assemble(M, J, bias):
        mm = M[ARM, ARM]
        j_eef = J[:, ARM]
        m_eef = np.linalg.pinv(j_eef @ np.linalg.pinv(mm) @ j_eef.T)
        return j_eef.T @ (m_eef @ (kp * dpose)) + bias[ARM]

    M_o = np.asarray(dynamics.crba(model, inert, jnp.asarray(q)))
    J_o = np.asarray(dynamics.body_jacobian(model, jnp.asarray(q), gripper,
                                            offset))
    b_o = np.asarray(dynamics.rnea_bias(model, inert, jnp.asarray(q),
                                        jnp.zeros(model.nv)))
    u_ours = assemble(M_o, J_o, b_o)

    d = _mj_at(mj, q)
    Mfull = np.zeros((mj.nv, mj.nv))
    mujoco.mj_fullM(mj, d, Mfull)
    kin = dynamics.fk(model, jnp.asarray(q), jnp.zeros(model.nv))
    p = np.asarray(kin.pos[gripper] + kin.rot[gripper] @ offset)
    jacp = np.zeros((3, mj.nv))
    jacr = np.zeros((3, mj.nv))
    mujoco.mj_jac(mj, d, jacp, jacr, p, gripper + 1)
    J_mj = np.concatenate([jacp, jacr], 0)
    u_mj = assemble(Mfull, J_mj, np.asarray(d.qfrc_bias))

    np.testing.assert_allclose(u_ours, u_mj, rtol=1e-3, atol=1e-4)
