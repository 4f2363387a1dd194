"""Dual-head PPO learning-direction golden: a two-head Gaussian bandit.

The widowGo1 training pathology in round 2 (policy converging to a mean
WORSE than zero) motivated this test: it isolates the dual-head PPO
update (per-head log-probs, advantage mixing, clipped surrogate —
reference ppo.py:196-206, actor_critic.py:341-345) from the physics.

Env: obs is constant; per-step rewards are
  leg  head: -mean((a_leg - 0.3)^2)
  arm  head: -mean((a_arm + 0.2)^2)
A correct PPO must move the leg action mean toward +0.3 and the arm
action mean toward -0.2. A sign error anywhere in the head split,
mixing, ratio, or advantage normalization makes one (or both) heads
move AWAY instead.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dwbc_tpu.models import actor_critic as ac_lib
from dwbc_tpu.rl import ppo as ppo_lib

NUM_OBS = 76 * 11 + 24
N_ENVS = 64
T = 8


def _rollout(model, params, key, obs):
    """Sample one (T, N) batch of transitions from the bandit."""
    std = params["params"]["std"]
    mean = model.apply(params, obs, False, method="act_mean")
    ks = jax.random.split(key, T)

    def step(_, k):
        a = mean + std * jax.random.normal(k, mean.shape)
        logp = ppo_lib.logp_heads(
            ppo_lib.PPOConfig(num_heads=2), a, mean, std)
        r_leg = -jnp.mean(jnp.square(a[:, :12] - 0.3), -1)
        r_arm = -jnp.mean(jnp.square(a[:, 12:] + 0.2), -1)
        value = model.apply(params, obs, method="evaluate")
        tr = ppo_lib.Transition(
            obs=obs, actions=a,
            rewards=jnp.stack([r_leg, r_arm], -1),
            dones=jnp.zeros((N_ENVS,), bool),
            time_outs=jnp.zeros((N_ENVS,), bool),
            values=value, log_probs=logp, mu=mean,
            sigma=jnp.broadcast_to(std, mean.shape),
            target_arm_torques=jnp.zeros((N_ENVS, 6)),
            current_arm_dof_pos=jnp.zeros((N_ENVS, 6)),
            current_arm_dof_vel=jnp.zeros((N_ENVS, 6)))
        return None, tr

    _, traj = jax.lax.scan(step, None, ks)
    return traj


@pytest.mark.parametrize("mix_counter", [0, 1500])
def test_dual_head_ppo_learns_both_heads(mix_counter):
    cfg = ppo_lib.PPOConfig(num_heads=2, use_dagger=False, use_roa=False,
                            num_learning_epochs=2, num_mini_batches=2)
    model = ac_lib.ActorCritic()
    key = jax.random.PRNGKey(0)
    obs = jnp.zeros((N_ENVS, NUM_OBS))
    params = model.init(key, obs)
    state = ppo_lib.init_state(cfg, params)
    # freeze the curriculum counter so the mixing ratio is fixed
    state = state.replace(counter=jnp.asarray(mix_counter, jnp.int32))

    def mean_heads(params):
        m = np.asarray(model.apply(params, obs, False, method="act_mean"))
        return m[:, :12].mean(), m[:, 12:].mean()

    leg0, arm0 = mean_heads(state.params)

    @jax.jit
    def one_iter(state, key):
        k1, k2 = jax.random.split(key)
        traj = _rollout(model, state.params, k1, obs)
        last_values = model.apply(state.params, obs, method="evaluate")
        returns, adv = ppo_lib.compute_gae(cfg, traj, last_values)
        new_state, metrics = ppo_lib.update(cfg, model, state, traj,
                                            returns, adv, k2)
        # keep the counter frozen (update increments it)
        return new_state.replace(counter=state.counter), metrics

    for i in range(60):
        key, k = jax.random.split(key)
        state, _ = one_iter(state, k)

    leg1, arm1 = mean_heads(state.params)
    # both heads must move toward their targets (leg +0.3, arm -0.2)
    assert leg1 > leg0 + 0.05, (leg0, leg1)
    assert arm1 < arm0 - 0.03, (arm0, arm1)
