"""Recurrent ActorCritic variant (reference actor_critic_recurrent.py,
present-but-unused by widowGo1 — capability-parity module)."""

import jax
import jax.numpy as jnp
import numpy as np

from dwbc_tpu.models.actor_critic_recurrent import ActorCriticRecurrent


def _make():
    model = ActorCriticRecurrent(num_obs=48, num_actions=12,
                                 rnn_hidden_size=64,
                                 actor_hidden_dims=(64,),
                                 critic_hidden_dims=(64,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((3, 48)))
    return model, params


def test_step_shapes_and_state_propagation():
    model, params = _make()
    carry = model.apply(params, 3, method="initial_state")
    obs = jnp.ones((3, 48))
    carry1, mean1, val1 = model.apply(params, carry, obs, method="step")
    assert mean1.shape == (3, 12) and val1.shape == (3, 1)
    # hidden state must change the output on repeated identical inputs
    carry2, mean2, _ = model.apply(params, carry1, obs, method="step")
    assert not np.allclose(np.asarray(mean1), np.asarray(mean2))


def test_done_resets_hidden_state():
    model, params = _make()
    carry = model.apply(params, 2, method="initial_state")
    obs = jnp.ones((2, 48))
    carry, _, _ = model.apply(params, carry, obs, method="step")
    carry, _, _ = model.apply(params, carry, obs, method="step")
    # env 0 done -> its next output equals a fresh-state output
    dones = jnp.asarray([True, False])
    _, mean_reset, _ = model.apply(params, carry, obs, dones, method="step")
    fresh = model.apply(params, 2, method="initial_state")
    _, mean_fresh, _ = model.apply(params, fresh, obs, method="step")
    np.testing.assert_allclose(np.asarray(mean_reset[0]),
                               np.asarray(mean_fresh[0]), atol=1e-6)
    assert not np.allclose(np.asarray(mean_reset[1]),
                           np.asarray(mean_fresh[1]))


def test_unroll_matches_stepwise():
    model, params = _make()
    T, B = 5, 2
    key = jax.random.PRNGKey(1)
    obs_seq = jax.random.normal(key, (T, B, 48))
    dones = jnp.zeros((T, B), bool).at[2, 0].set(True)
    carry = model.apply(params, B, method="initial_state")
    _, (means, values) = model.apply(params, carry, obs_seq, dones,
                                     method="unroll")
    assert means.shape == (T, B, 12) and values.shape == (T, B, 1)
    c = model.apply(params, B, method="initial_state")
    for t in range(T):
        c, m, v = model.apply(params, c, obs_seq[t], dones[t], method="step")
        np.testing.assert_allclose(np.asarray(m), np.asarray(means[t]),
                                   atol=1e-6)


def test_recurrent_training_improves_reward():
    """End-to-end BPTT training (VERDICT r1 item 4): a small recurrent
    policy on go1_flat improves reward over ~50 iterations (the masked-
    scan equivalent of the reference's padded-trajectory recurrent
    minibatches, rollout_storage.py:208-257)."""
    from dwbc_tpu.envs import legged_config as lc
    from dwbc_tpu.envs.legged_robot import LeggedRobotEnv
    from dwbc_tpu.rl import ppo as ppo_lib
    from dwbc_tpu.rl.recurrent import RecurrentRunner

    env = LeggedRobotEnv(lc.go1_flat(), num_envs=16, seed=2)
    cfg = ppo_lib.PPOConfig(
        num_heads=1, use_dagger=False, use_roa=False,
        num_learning_epochs=3, num_mini_batches=2,
        entropy_coef=0.01, learning_rate=5e-4, schedule="adaptive",
        desired_kl=0.01, min_policy_std=(0.0,) * 12)
    runner = RecurrentRunner(env, cfg, num_steps_per_env=24, seed=1)
    hist = runner.learn(80, log=None)
    early = float(np.mean(hist[:10]))
    late = float(np.mean(hist[-10:]))
    assert np.isfinite(hist).all()
    assert late > early, (early, late)


def test_recurrent_sharded_update_matches_single_device():
    """Multi-device recurrent path (lifts the r3 single-device restriction):
    with num_mini_batches=1 and num_learning_epochs=1 the device-local
    minibatch is the whole local shard, so the pmean'd gradient equals the
    global-batch gradient and the shard_map update must match the
    single-device update exactly (same layout contract as OnPolicyRunner's
    shard_map path, rl/runner.py)."""
    from dwbc_tpu.envs import legged_config as lc
    from dwbc_tpu.envs.legged_robot import LeggedRobotEnv
    from dwbc_tpu.parallel import mesh as mesh_lib
    from dwbc_tpu.rl import ppo as ppo_lib
    from dwbc_tpu.rl.recurrent import RecurrentRunner

    cfg = ppo_lib.PPOConfig(
        num_heads=1, use_dagger=False, use_roa=False,
        num_learning_epochs=1, num_mini_batches=1,
        entropy_coef=0.01, learning_rate=5e-4, schedule="adaptive",
        desired_kl=0.01, min_policy_std=(0.0,) * 12)

    def run(mesh, iters):
        env = LeggedRobotEnv(lc.go1_flat(), num_envs=16, seed=3)
        r = RecurrentRunner(env, cfg, num_steps_per_env=8, seed=5,
                            mesh=mesh)
        r.learn(iters, log=None)
        return jax.tree.map(np.asarray, r.ppo_state.params)

    # ONE iteration: the rollout is identical (same initial params/keys),
    # so only the update differs, and the pmean-of-local-means gradient
    # equals the global mean up to summation order (~1e-7). More
    # iterations would diverge by design: the tiny reduction-order
    # difference feeds back through chaotic contact dynamics.
    single = run(None, 1)
    sharded = run(mesh_lib.make_mesh(8), 1)
    flat_s, _ = jax.tree_util.tree_flatten(single)
    flat_m, _ = jax.tree_util.tree_flatten(sharded)
    for a, b in zip(flat_s, flat_m):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-3)
