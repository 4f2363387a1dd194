"""WidowGo1 env behavior tests: obs layout, curricula, EE goals, dual
rewards, resets — the task semantics of reference widowGo1.py made
checkable."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dwbc_tpu.core import maths
from dwbc_tpu.envs.config import TerrainCfg, WidowGo1Cfg
from dwbc_tpu.envs.widowgo1 import WidowGo1Env


@pytest.fixture(scope="module")
def env():
    cfg = dataclasses.replace(WidowGo1Cfg(), terrain=TerrainCfg(mesh_type="plane"))
    return WidowGo1Env(cfg, num_envs=8, seed=1)


@pytest.fixture(scope="module")
def stepped(env):
    state, obs = env.reset(jax.random.PRNGKey(0))
    for i in range(3):
        state, out = env.step(
            state, 0.2 * jax.random.normal(jax.random.PRNGKey(i), (8, 18)),
            jnp.asarray(float(i)))
    return state, out


class TestObs:
    def test_dims(self, env, stepped):
        _, out = stepped
        assert out.obs.shape == (8, 860)
        assert env.num_proprio == 76
        assert env.num_priv == 24

    def test_priv_slice_content(self, env, stepped):
        """priv obs = [mass_params(5), friction(1), motor_strength-1(18)]
        (widowGo1.py:986-991)."""
        state, out = stepped
        priv = out.obs[:, 76:100]
        np.testing.assert_allclose(np.asarray(priv[:, :5]),
                                   np.asarray(state.mass_params), atol=1e-5)
        np.testing.assert_allclose(np.asarray(priv[:, 5]),
                                   np.asarray(state.friction), atol=1e-5)
        np.testing.assert_allclose(np.asarray(priv[:, 6:]),
                                   np.asarray(state.motor_strength - 1),
                                   atol=1e-5)

    def test_history_contains_prop(self, env, stepped):
        """obs = [prop, priv, history]; the obs history segment at step
        t+1 ends with the prop emitted at step t (widowGo1.py:992-1001:
        obs is assembled from the pre-roll history, then prop is pushed)."""
        state, out = stepped
        prop_t = np.asarray(out.obs[:, :76])
        state2, out2 = env.step(state, jnp.zeros((8, 18)),
                                jnp.asarray(3.0))
        hist = np.asarray(out2.obs[:, 100:].reshape(8, 10, 76))
        live = ~np.asarray(out2.reset)  # resets clear the history
        assert live.any()
        np.testing.assert_allclose(hist[live, -1], prop_t[live], atol=1e-5)
        assert np.all(np.isfinite(hist))


class TestCurriculum:
    def test_lerp_schedules(self, env):
        c0 = env.curriculum(jnp.asarray(0.0))
        c1 = env.curriculum(jnp.asarray(1.0))
        # init ranges at counter 0 (widowGo1_config.py:100-101: [0, 0])
        np.testing.assert_allclose(np.asarray(c0["lin_vel_x"]), [0, 0])
        # schedules are [0, 1]: final after one update
        np.testing.assert_allclose(np.asarray(c1["lin_vel_x"]), [0, 0.9])
        np.testing.assert_allclose(float(c1["tracking_ee"]), 0.55)

    def test_command_clipping(self, env):
        """commands below the clip thresholds are zeroed entirely
        (widowGo1.py:841-843)."""
        curr = env.curriculum(jnp.asarray(1e9))
        cmd = env._sample_commands(jax.random.PRNGKey(0), 512, curr)
        cmd = np.asarray(cmd)
        nz = np.abs(cmd).sum(-1) > 0
        # any nonzero command must satisfy vx>0.3 or |wz|>0.6
        ok = (cmd[nz, 0] > 0.3) | (np.abs(cmd[nz, 2]) > 0.6)
        assert ok.all()
        assert (cmd[:, 1] == 0).all()  # vy always zero


class TestEEGoals:
    def test_goal_in_curriculum_range(self, env, stepped):
        state, _ = stepped
        g = np.asarray(state.ee_goal_sphere)
        assert (g[:, 0] >= 0.19).all() and (g[:, 0] <= 0.71).all()

    def test_collision_check_rejects_body_box(self, env):
        """Goals inside the body AABB are flagged (widowGo1.py:1337-1342)."""
        inside = jnp.tile(jnp.asarray([[0.05, 0.0, -0.3]]), (2, 1))
        sphere_inside = maths.cart2sphere(inside)
        col = env._collision_check(sphere_inside, sphere_inside)
        assert bool(col.all())
        outside = maths.cart2sphere(jnp.tile(jnp.asarray([[0.6, 0.0, 0.2]]),
                                             (2, 1)))
        col2 = env._collision_check(outside, outside)
        assert not bool(col2.any())

    def test_goal_timer_advances(self, env, stepped):
        state, _ = stepped
        assert float(state.goal_timer.min()) >= 0


class TestRewards:
    def test_dual_heads_scale(self, env, stepped):
        """Rewards are divided by 100 and not dt-scaled: magnitudes are
        O(0.01) per step (widowGo1.py:189, 205)."""
        _, out = stepped
        assert np.abs(np.asarray(out.rew)).max() < 1.0
        assert np.abs(np.asarray(out.arm_rew)).max() < 1.0

    def test_survive_reward_floor(self, env):
        """A standing robot with zero commands earns survive*0.2/100 on
        the leg head plus tracking terms."""
        state, obs = env.reset(jax.random.PRNGKey(3))
        state, out = env.step(state, jnp.zeros((8, 18)), jnp.zeros(()))
        # survive (0.2) + tracking_ang_vel_yaw_exp(~0.15*1) + lin_x(~0)
        # all /100; energy/foot penalties subtract
        assert np.asarray(out.rew).mean() > -0.05


class TestReset:
    def test_termination_resets_state(self, env):
        """Force a tip-over by teleporting base roll; env must reset with
        episode_length back to 0."""
        state, obs = env.reset(jax.random.PRNGKey(4))
        q = state.robot.q
        bad_quat = maths.quat_from_euler_xyz(
            jnp.full((8,), 0.8), jnp.zeros(8), jnp.zeros(8))
        q = q.at[:, 3:7].set(bad_quat)
        state = state.replace(robot=state.robot.replace(q=q))
        state, out = env.step(state, jnp.zeros((8, 18)), jnp.zeros(()))
        assert bool(out.reset.any())
        reset_ids = np.asarray(out.reset)
        assert (np.asarray(state.episode_length)[reset_ids] == 0).all()
        # reset envs stand upright again
        w = np.asarray(state.robot.q[reset_ids, 6])
        assert (np.abs(w) > 0.98).all()

    def test_spawn_relative_height_above_local_ground(self, env):
        """--spawn_relative (the r4 campaign lever): fresh spawns sit at
        ground + 0.40 m over the LOCAL terrain sample, vs the reference's
        absolute z where drop height varies with terrain height. Uses only
        the reset graph (cheap compile). Flag is restored for the other
        module-scoped tests."""
        # private access bypasses the trace-mutation guard deliberately:
        # earlier module-scoped tests already traced step, but this test
        # exercises only the un-jitted reset graph, where the flag is
        # read fresh each call
        env._spawn_relative = True
        try:
            state, _ = env.reset(jax.random.PRNGKey(11))
        finally:
            env._spawn_relative = False
        q = np.asarray(state.robot.q)
        ground = np.asarray(env.hf.sample(state.robot.q[:, 0],
                                          state.robot.q[:, 1]))
        np.testing.assert_allclose(q[:, 2] - ground, 0.40, atol=1e-5)


class TestFullRewardSurface:
    def test_every_reference_scale_enables(self):
        """VERDICT r1 item 6: every reward scale in the reference config
        (widowGo1_config.py:231-266, including the base legged_robot terms
        reachable through reflection) can be made nonzero without code
        changes, and the env still produces finite dual rewards."""
        from dwbc_tpu.envs.config import (ArmRewardScalesCfg, RewardScalesCfg,
                                          RewardsCfg)

        scales = RewardScalesCfg(**{
            f.name: 0.01 for f in dataclasses.fields(RewardScalesCfg)})
        arm_scales = ArmRewardScalesCfg(**{
            f.name: 0.01 for f in dataclasses.fields(ArmRewardScalesCfg)})
        cfg = dataclasses.replace(
            WidowGo1Cfg(),
            terrain=TerrainCfg(mesh_type="plane"),
            rewards=RewardsCfg(scales=scales, arm_scales=arm_scales))
        env = WidowGo1Env(cfg, num_envs=4, seed=0)
        assert len(env.reward_names) == len(dataclasses.fields(RewardScalesCfg))
        assert len(env.arm_reward_names) == len(
            dataclasses.fields(ArmRewardScalesCfg))
        # evaluate the full reward library directly on the reset state:
        # the 59k-op physics graph is IDENTICAL to the default config's
        # (reward scales only change the assembly tail), so stepping here
        # would recompile ~6 min of physics for zero extra coverage
        state, obs = env.reset(jax.random.PRNGKey(0))
        N = 4
        curr = {"tracking_ang_vel_yaw_exp": jnp.asarray(0.5),
                "tracking_ee": jnp.asarray(0.5)}
        base_quat = state.robot.q[:, 3:7]
        yaw = maths.euler_from_quat(base_quat)[2]
        base_yaw_quat = maths.quat_from_euler_xyz(0 * yaw, 0 * yaw, yaw)
        rew, arm_rew, ep, met, _, _ = env._rewards(
            state, jnp.zeros((N, 3)), jnp.zeros((N, 3)), base_yaw_quat,
            ee_pos=state.robot.q[:, :3] + jnp.asarray([0.4, 0.0, 0.2]),
            ee_orn=jnp.tile(jnp.asarray([0.0, 0.7071068, 0.0, 0.7071068]),
                            (N, 1)),
            curr=curr, reset_buf=jnp.zeros((N,), bool),
            time_out=jnp.zeros((N,), bool),
            foot_forces_sensor=state.foot_forces)
        assert np.isfinite(np.asarray(rew)).all()
        assert np.isfinite(np.asarray(arm_rew)).all()
        # every enabled term accumulated an episode sum entry
        for k in env.reward_names + env.arm_reward_names:
            assert k in ep

    def test_contact_termination_enables(self):
        """terminate_after_contacts_on wires contact-force termination
        (reference widowGo1.py:940; [] in the released config)."""
        from dwbc_tpu.envs.config import AssetCfg

        cfg = dataclasses.replace(
            WidowGo1Cfg(), terrain=TerrainCfg(mesh_type="plane"),
            asset=AssetCfg(terminate_after_contacts_on=("trunk", "wx250")))
        env = WidowGo1Env(cfg, num_envs=4, seed=0)
        assert env.termination_bodies.shape[0] > 0
        # drive check_termination directly (the step-side physics graph is
        # config-independent; see test_every_reference_scale_enables)
        state, obs = env.reset(jax.random.PRNGKey(0))
        zeros = jnp.zeros((4,))
        goal = jnp.tile(jnp.asarray([0.5, 0.0, 0.0]), (4, 1))
        r_t, p_t, z_t, c_t = env.check_termination(state, zeros, zeros, goal)
        assert not bool(jnp.any(c_t))  # no contact force on term bodies yet
        forced = state.replace(body_forces=state.body_forces.at[
            0, env.termination_bodies[0]].set(jnp.asarray([0.0, 0.0, 50.0])))
        _, _, _, c_t2 = env.check_termination(forced, zeros, zeros, goal)
        assert bool(c_t2[0]) and not bool(jnp.any(c_t2[1:]))
        # goal-conditioned roll/pitch signs (widowGo1.py:942-947)
        roll = jnp.asarray([0.3, -0.3, 0.3, 0.0])
        goal_side = jnp.tile(jnp.asarray([0.5, 0.1, 0.1]), (4, 1))
        r_t3, _, _, _ = env.check_termination(state, roll, zeros, goal_side)
        assert bool(r_t3[0]) and not bool(r_t3[1]) and not bool(r_t3[3])
