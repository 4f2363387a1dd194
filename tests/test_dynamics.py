"""Golden-value tests for the articulated dynamics core.

The reference has no unit tests (SURVEY.md §4); these validate our PhysX
replacement against analytic mechanics: free-fall, pendulum dynamics,
energy behavior, and ABA<->CRBA/RNEA cross-consistency.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dwbc_tpu.core import maths, urdf
from dwbc_tpu.core.model import RobotModel, free_body_model
from dwbc_tpu.sim import dynamics


def _pendulum_model(length=1.0, mass=2.0):
    """Single revolute joint about y, com at (0,0,-l): a point-mass pendulum
    hanging from the (fixed-in-place) base."""
    e = np.zeros((1,), np.float32)
    return RobotModel(
        parent=np.array([-1, 0], np.int32),
        joint_type=np.zeros((2,), np.int32),
        joint_axis=np.array([[0, 0, 0], [0, 1, 0]], np.float32),
        tree_rot=np.tile(np.eye(3, dtype=np.float32), (2, 1, 1)),
        tree_pos=np.zeros((2, 3), np.float32),
        mass=np.array([1e6, mass], np.float32),  # huge base ~ fixed base
        com=np.array([[0, 0, 0], [0, 0, -length]], np.float32),
        inertia=np.stack([np.eye(3, dtype=np.float32) * 1e6,
                          np.zeros((3, 3), np.float32)]),
        dof_lower=-e - 10, dof_upper=e + 10, dof_effort=e + 100,
        dof_velocity=e + 100, dof_damping=e, dof_friction=e,
        dof_armature=e,
        geom_body=np.zeros((0,), np.int32),
        geom_pos=np.zeros((0, 3), np.float32),
        geom_radius=np.zeros((0,), np.float32),
        body_names=("base", "bob"),
        dof_names=("hinge",),
        sites={},
        geom_link=(),
    )


def _base_q(pos=(0, 0, 0), nj=0):
    q = jnp.zeros(7 + nj)
    q = q.at[0:3].set(jnp.asarray(pos, jnp.float32))
    q = q.at[6].set(1.0)
    return q


class TestFreeBody:
    def setup_method(self):
        self.m = free_body_model("box", mass=1.35, half_extents=(0.05, 0.05, 0.05))

    def test_free_fall(self):
        q = _base_q((0, 0, 1.0))
        qd = jnp.zeros(6)
        qdd, _ = dynamics.aba(self.m, dynamics.default_inertial(self.m), q, qd,
                              jnp.zeros(0))
        np.testing.assert_allclose(qdd[:3], [0, 0, -9.81], atol=1e-5)
        np.testing.assert_allclose(qdd[3:6], 0, atol=1e-5)

    def test_free_fall_with_velocity(self):
        """Coordinate acceleration must stay -g regardless of velocity
        (catches spatial->classical acceleration conversion bugs)."""
        q = _base_q((0, 0, 1.0))
        key = jax.random.PRNGKey(0)
        qd = jax.random.normal(key, (6,))
        qdd, _ = dynamics.aba(self.m, dynamics.default_inertial(self.m), q, qd,
                              jnp.zeros(0))
        np.testing.assert_allclose(qdd[:3], [0, 0, -9.81], atol=1e-4)
        np.testing.assert_allclose(qdd[3:6], 0, atol=1e-4)

    def test_external_force(self):
        q = _base_q((0, 0, 1.0))
        qd = jnp.zeros(6)
        f_ext = jnp.zeros((1, 6)).at[0, 3:].set(jnp.array([1.35 * 9.81, 0, 1.35 * 9.81]))
        qdd, _ = dynamics.aba(self.m, dynamics.default_inertial(self.m), q, qd,
                              jnp.zeros(0), f_ext_world=f_ext)
        np.testing.assert_allclose(qdd[:3], [9.81, 0, 0], atol=1e-4)


class TestPendulum:
    def setup_method(self):
        self.m = _pendulum_model(length=1.0, mass=2.0)
        self.inert = dynamics.default_inertial(self.m)

    def _pin_base(self):
        """External world force canceling the base's weight: with the huge
        base mass, residual base acceleration from pendulum coupling is
        negligible, emulating a fixed pivot."""
        f = jnp.zeros((2, 6))
        return f.at[0, 5].set(1e6 * 9.81)

    def test_pendulum_acceleration(self):
        """theta'' = -(g/l) sin(theta) for a point-mass pendulum."""
        for theta in [0.0, 0.3, -0.7, 1.2]:
            q = _base_q(nj=1).at[7].set(theta)
            qd = jnp.zeros(7)
            qdd, _ = dynamics.aba(self.m, self.inert, q, qd, jnp.zeros(1),
                                  f_ext_world=self._pin_base())
            expected = -9.81 / 1.0 * np.sin(theta)
            np.testing.assert_allclose(qdd[6], expected, rtol=1e-3, atol=1e-3)

    def test_gravity_compensation(self):
        """RNEA bias torque must exactly hold the pendulum static."""
        theta = 0.6
        q = _base_q(nj=1).at[7].set(theta)
        qd = jnp.zeros(7)
        bias = dynamics.rnea_bias(self.m, self.inert, q, qd)
        qdd, _ = dynamics.aba(self.m, self.inert, q, qd, bias[6:7],
                              f_ext_world=self._pin_base())
        np.testing.assert_allclose(qdd[6], 0.0, atol=1e-2)


class TestWidowGo1:
    @classmethod
    def setup_class(cls):
        cls.m = urdf.load_urdf(urdf.WIDOW_GO1_URDF, dof_order=urdf.WIDOW_GO1_DOF_ORDER)
        cls.inert = dynamics.default_inertial(cls.m)

    def test_model_shape(self):
        assert self.m.nb == 21
        assert self.m.nj == 20
        assert self.m.dof_names[:3] == ("FR_hip_joint", "FR_thigh_joint", "FR_calf_joint")
        assert 12.0 < self.m.total_mass() < 16.0
        # 4 feet spheres present
        assert len(self.m.geoms_of("foot")) == 4

    def test_fk_feet_below_base(self):
        q = _base_q((0, 0, 0.42), nj=20)
        # reference default pose (widowGo1_config.py:135-160)
        default = jnp.array([-0.1, 0.8, -1.5, 0.1, 0.8, -1.5,
                             -0.1, 0.8, -1.5, 0.1, 0.8, -1.5] + [0.0] * 8)
        q = q.at[7:].set(default)
        kin = dynamics.fk(self.m, q, jnp.zeros(self.m.nv))
        for foot in urdf.FEET_ORDER:
            s = self.m.sites[foot]
            p = kin.pos[s.body] + kin.rot[s.body] @ jnp.asarray(s.pos)
            # default crouch (thigh 0.8, calf -1.5) puts feet ~0.30 below
            # the 0.42 base -> slightly above ground at spawn
            assert float(p[2]) < 0.16, (foot, p)
            assert float(p[2]) > -0.05, (foot, p)

    def test_aba_crba_rnea_consistency(self):
        """M(q) qdd + bias = tau  must hold between the three algorithms."""
        key = jax.random.PRNGKey(1)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        q = _base_q((0, 0, 0.5), nj=20)
        q = q.at[7:].set(0.3 * jax.random.normal(k1, (20,)))
        quat = maths.normalize(jax.random.normal(k2, (4,)))
        q = q.at[3:7].set(quat)
        qd = 0.5 * jax.random.normal(k3, (26,))
        tau = jax.random.normal(k4, (20,))

        qdd, kin = dynamics.aba(self.m, self.inert, q, qd, tau)
        M = dynamics.crba(self.m, self.inert, q)
        bias = dynamics.rnea_bias(self.m, self.inert, q, qd)

        # convert world-coord base accel back to base spatial accel
        R0 = kin.rot[0]
        w_b, v_b = kin.vel[0][:3], kin.vel[0][3:]
        a0 = jnp.concatenate(
            [R0.T @ qdd[3:6], R0.T @ qdd[0:3] - jnp.cross(w_b, v_b)]
        )
        qdd_sp = jnp.concatenate([a0, qdd[6:]])
        tau_full = jnp.concatenate([jnp.zeros(6), tau])
        lhs = M @ qdd_sp + bias
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(tau_full),
                                   rtol=2e-3, atol=2e-3)

    def test_vmapped_batch(self):
        q = _base_q((0, 0, 0.42), nj=20)
        qs = jnp.tile(q[None], (8, 1))
        qds = jnp.zeros((8, 26))
        taus = jnp.zeros((8, 20))
        f = jax.vmap(lambda q, qd, t: dynamics.aba(
            self.m, self.inert, q, qd, t)[0])
        qdds = f(qs, qds, taus)
        assert qdds.shape == (8, 26)
        assert np.all(np.isfinite(np.asarray(qdds)))

    def test_ee_jacobian_finite_diff(self):
        ee = self.m.sites["wx250s/ee_gripper_link"]
        q = _base_q((0, 0, 0.5), nj=20)
        q = q.at[7:].set(0.2 * jax.random.normal(jax.random.PRNGKey(2), (20,)))
        J = dynamics.body_jacobian(self.m, q, ee.body, jnp.asarray(ee.pos))

        def ee_pos(q):
            kin = dynamics.fk(self.m, q, jnp.zeros(26))
            return kin.pos[ee.body] + kin.rot[ee.body] @ jnp.asarray(ee.pos)

        # finite-diff joint columns
        eps = 1e-4
        for j in [12, 13, 14, 15, 16, 17]:  # arm dofs
            dq = q.at[7 + j].add(eps)
            dp = (ee_pos(dq) - ee_pos(q)) / eps
            np.testing.assert_allclose(np.asarray(J[0:3, 6 + j]), np.asarray(dp),
                                       atol=1e-2)
