"""Dual-head ActorCritic with Regularized Online Adaptation encoders.

Flax re-design of the reference networks (rsl_rl modules/actor_critic.py):
  * StateHistoryEncoder: per-step linear projection -> 1D convs over the
    T in {10, 20, 50} step history -> linear (reference :39-84);
  * Actor: privileged-obs encoder (24->64->20) OR history encoder to the
    same 20-d latent, shared backbone [prop(76)+latent(20) -> 128], then
    a 12-d tanh leg head and 6-d tanh arm head (reference :119-229);
  * Critic: prop+priv input, shared backbone, separate leg/arm value
    heads -> (…, 2) values (reference :233-289);
  * learnable per-joint std with a min-std floor applied by the PPO
    update (reference :296, ppo.py:293-296);
  * per-head (leg/arm) log-prob and entropy sums -> (…, 2) tensors
    (reference :326-345).

Distribution math is pure functions over (mean, std) — no stateful
`self.distribution`.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


_ACT = {
    "elu": nn.elu,
    "relu": nn.relu,
    "selu": nn.selu,
    "crelu": nn.relu,
    "lrelu": nn.leaky_relu,
    "tanh": nn.tanh,
    "sigmoid": nn.sigmoid,
}


class StateHistoryEncoder(nn.Module):
    """(B, T, prop) -> (B, out). Conv arch per reference :53-69."""

    tsteps: int
    output_size: int
    activation: str = "elu"
    channel_size: int = 10

    @nn.compact
    def __call__(self, obs_hist: jax.Array) -> jax.Array:
        act = _ACT[self.activation]
        ch = self.channel_size
        B, T, P = obs_hist.shape
        assert T == self.tsteps
        x = act(nn.Dense(3 * ch)(obs_hist.reshape(B * T, P)))
        x = x.reshape(B, T, 3 * ch)  # flax Conv is NLC (batch, length, chan)
        if self.tsteps == 50:
            x = act(nn.Conv(2 * ch, (8,), strides=(4,), padding="VALID")(x))
            x = act(nn.Conv(ch, (5,), strides=(1,), padding="VALID")(x))
            x = act(nn.Conv(ch, (5,), strides=(1,), padding="VALID")(x))
        elif self.tsteps == 20:
            x = act(nn.Conv(2 * ch, (6,), strides=(2,), padding="VALID")(x))
            x = act(nn.Conv(ch, (4,), strides=(2,), padding="VALID")(x))
        elif self.tsteps == 10:
            x = act(nn.Conv(2 * ch, (4,), strides=(2,), padding="VALID")(x))
            x = act(nn.Conv(ch, (2,), strides=(1,), padding="VALID")(x))
        else:
            raise ValueError("tsteps must be 10, 20 or 50")
        x = x.reshape(B, -1)
        return act(nn.Dense(self.output_size)(x))


def _mlp(dims, act, x, final_act=True):
    for i, d in enumerate(dims):
        x = nn.Dense(d)(x)
        if i < len(dims) - 1 or final_act:
            x = act(x)
    return x


class Actor(nn.Module):
    num_prop: int = 76
    num_priv: int = 24
    num_hist: int = 10
    priv_encoder_dims: Sequence[int] = (64, 20)
    actor_hidden_dims: Sequence[int] = (128,)
    leg_head_dims: Sequence[int] = (128, 128)
    arm_head_dims: Sequence[int] = (128, 128)
    num_leg_actions: int = 12
    num_arm_actions: int = 6
    adaptive_arm_gains: bool = False
    adaptive_arm_gains_scale: float = 10.0
    activation: str = "elu"

    def setup(self):
        act = _ACT[self.activation]
        self._act = act
        self.priv_encoder_layers = [nn.Dense(d) for d in self.priv_encoder_dims]
        self.history_encoder = StateHistoryEncoder(
            tsteps=self.num_hist, output_size=self.priv_encoder_dims[-1],
            activation=self.activation)
        self.backbone_layers = [nn.Dense(d) for d in self.actor_hidden_dims]
        n_arm = self.num_arm_actions * (2 if self.adaptive_arm_gains else 1)
        self.leg_layers = [nn.Dense(d) for d in self.leg_head_dims] + [
            nn.Dense(self.num_leg_actions)]
        self.arm_layers = [nn.Dense(d) for d in self.arm_head_dims] + [
            nn.Dense(n_arm)]

    def infer_priv_latent(self, obs: jax.Array) -> jax.Array:
        x = obs[..., self.num_prop:self.num_prop + self.num_priv]
        for l in self.priv_encoder_layers:
            x = self._act(l(x))
        return x

    def infer_hist_latent(self, obs: jax.Array) -> jax.Array:
        hist = obs[..., -self.num_hist * self.num_prop:]
        B = hist.shape[0]
        return self.history_encoder(hist.reshape(B, self.num_hist, self.num_prop))

    def __call__(self, obs: jax.Array, hist_encoding: bool = False) -> jax.Array:
        prop = obs[..., : self.num_prop]
        if isinstance(hist_encoding, (bool, int)):
            # static switch: only the chosen encoder is traced
            latent = (self.infer_hist_latent(obs) if hist_encoding
                      else self.infer_priv_latent(obs))
        else:
            # traced switch: one compiled program serves both modes (the
            # runner flips per-iteration for the DAgger phase; both
            # encoders are tiny next to the physics graph, and a single
            # compile of the fused rollout replaces two)
            latent = jnp.where(hist_encoding, self.infer_hist_latent(obs),
                               self.infer_priv_latent(obs))
        x = jnp.concatenate([prop, latent], -1)
        for l in self.backbone_layers:
            x = self._act(l(x))
        leg = x
        for l in self.leg_layers[:-1]:
            leg = self._act(l(leg))
        leg = jnp.tanh(self.leg_layers[-1](leg))
        arm = x
        for l in self.arm_layers[:-1]:
            arm = self._act(l(arm))
        arm = jnp.tanh(self.arm_layers[-1](arm))
        if self.adaptive_arm_gains:
            gains = self.adaptive_arm_gains_scale * arm[..., self.num_arm_actions:]
            arm = jnp.concatenate([arm[..., : self.num_arm_actions], gains], -1)
        return jnp.concatenate([leg, arm], -1)


class Critic(nn.Module):
    num_prop: int = 76
    num_priv: int = 24
    critic_hidden_dims: Sequence[int] = (128,)
    leg_head_dims: Sequence[int] = (128, 128)
    arm_head_dims: Sequence[int] = (128, 128)
    activation: str = "elu"

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        act = _ACT[self.activation]
        x = obs[..., : self.num_prop + self.num_priv]
        for d in self.critic_hidden_dims:
            x = act(nn.Dense(d)(x))
        leg = x
        for d in self.leg_head_dims:
            leg = act(nn.Dense(d)(leg))
        leg = nn.Dense(1)(leg)
        arm = x
        for d in self.arm_head_dims:
            arm = act(nn.Dense(d)(arm))
        arm = nn.Dense(1)(arm)
        return jnp.concatenate([leg, arm], -1)


class ActorCritic(nn.Module):
    """Wrapper holding actor, critic and the learnable per-joint std."""

    num_prop: int = 76
    num_priv: int = 24
    num_hist: int = 10
    num_leg_actions: int = 12
    num_arm_actions: int = 6
    init_std: Tuple[float, ...] = tuple([0.8, 1.0, 1.0] * 4 + [1.0] * 6)
    adaptive_arm_gains: bool = False
    adaptive_arm_gains_scale: float = 10.0
    activation: str = "elu"
    actor_hidden_dims: Sequence[int] = (128,)
    critic_hidden_dims: Sequence[int] = (128,)
    leg_head_dims: Sequence[int] = (128, 128)
    arm_head_dims: Sequence[int] = (128, 128)
    priv_encoder_dims: Sequence[int] = (64, 20)

    def setup(self):
        self.actor = Actor(
            num_prop=self.num_prop, num_priv=self.num_priv,
            num_hist=self.num_hist,
            priv_encoder_dims=self.priv_encoder_dims,
            actor_hidden_dims=self.actor_hidden_dims,
            leg_head_dims=self.leg_head_dims, arm_head_dims=self.arm_head_dims,
            num_leg_actions=self.num_leg_actions,
            num_arm_actions=self.num_arm_actions,
            adaptive_arm_gains=self.adaptive_arm_gains,
            adaptive_arm_gains_scale=self.adaptive_arm_gains_scale,
            activation=self.activation)
        self.critic = Critic(
            num_prop=self.num_prop, num_priv=self.num_priv,
            critic_hidden_dims=self.critic_hidden_dims,
            leg_head_dims=self.leg_head_dims, arm_head_dims=self.arm_head_dims,
            activation=self.activation)
        self.std = self.param(
            "std", lambda rng: jnp.asarray(self.init_std, jnp.float32))

    def __call__(self, obs, hist_encoding: bool = False):
        """Returns (action mean, std, value). Used for init — traces BOTH
        latent paths so all params (incl. history encoder) are created."""
        mean = self.actor(obs, hist_encoding)
        _ = self.actor.infer_hist_latent(obs)
        _ = self.actor.infer_priv_latent(obs)
        value = self.critic(obs)
        return mean, self.std, value

    def act_mean(self, obs, hist_encoding: bool = False):
        return self.actor(obs, hist_encoding)

    def evaluate(self, obs):
        return self.critic(obs)

    def priv_latent(self, obs):
        return self.actor.infer_priv_latent(obs)

    def hist_latent(self, obs):
        return self.actor.infer_hist_latent(obs)


# ---------------------------------------------------------------------------
# pure distribution math (per-head sums, reference actor_critic.py:326-345)


def normal_sample(key, mean, std):
    return mean + std * jax.random.normal(key, mean.shape)


def log_prob_per_head(actions, mean, std, num_leg: int = 12):
    lp = (-0.5 * jnp.square((actions - mean) / std)
          - jnp.log(std) - 0.5 * math.log(2 * math.pi))
    return jnp.stack([lp[..., :num_leg].sum(-1), lp[..., num_leg:].sum(-1)], -1)


def entropy_per_head(std, batch_shape, num_leg: int = 12):
    ent = 0.5 + 0.5 * math.log(2 * math.pi) + jnp.log(std)
    e = jnp.stack([ent[..., :num_leg].sum(-1), ent[..., num_leg:].sum(-1)], -1)
    return jnp.broadcast_to(e, batch_shape + (2,))
