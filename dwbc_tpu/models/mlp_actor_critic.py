"""Single-head MLP ActorCritic for the generic locomotion tasks.

The reference's pre-whole-body network shape (legged_robot_config.py:
204-208: actor/critic hidden [512, 256, 128], scalar init noise std,
single value head). Exposes the same method surface as the dual-head
ActorCritic (act_mean / evaluate / priv_latent / hist_latent) so the
rollout/PPO code is shared; the latent methods return zeros (no ROA on
this family)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .actor_critic import _ACT


class MlpActorCritic(nn.Module):
    num_obs: int = 48
    num_actions: int = 12
    actor_hidden_dims: Sequence[int] = (512, 256, 128)
    critic_hidden_dims: Sequence[int] = (512, 256, 128)
    activation: str = "elu"
    init_noise_std: float = 1.0

    def setup(self):
        self.actor_layers = [nn.Dense(d) for d in self.actor_hidden_dims] + [
            nn.Dense(self.num_actions)]
        self.critic_layers = [nn.Dense(d) for d in self.critic_hidden_dims] + [
            nn.Dense(1)]
        self.std = self.param(
            "std",
            lambda rng: jnp.full((self.num_actions,), self.init_noise_std))

    def act_mean(self, obs, hist_encoding: bool = False):
        act = _ACT[self.activation]
        x = obs
        for l in self.actor_layers[:-1]:
            x = act(l(x))
        return self.actor_layers[-1](x)

    def evaluate(self, obs):
        act = _ACT[self.activation]
        x = obs
        for l in self.critic_layers[:-1]:
            x = act(l(x))
        return self.critic_layers[-1](x)

    def priv_latent(self, obs):
        return jnp.zeros(obs.shape[:-1] + (1,))

    def hist_latent(self, obs):
        return jnp.zeros(obs.shape[:-1] + (1,))

    def __call__(self, obs, hist_encoding: bool = False):
        return self.act_mean(obs), self.std, self.evaluate(obs)
