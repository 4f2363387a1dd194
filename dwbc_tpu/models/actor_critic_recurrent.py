"""Recurrent ActorCritic variant (LSTM/GRU memory before the MLP).

Parity port of the reference ActorCriticRecurrent
(actor_critic_recurrent.py:40-116): a recurrent `Memory` wrapper encodes
observations before the actor/critic MLPs; hidden state is reset where
episodes end. Present-but-unused by the widowGo1 config in the reference
(SURVEY.md §2.3 row 22) — provided here for the same capability surface.

Functional JAX formulation: hidden state is explicit carry, not module
state. For BPTT training use `unroll` over a (T, B, obs) trajectory with
a done mask (the reference's padded-trajectory generator,
rollout_storage.py:208-257, becomes a masked scan)."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .actor_critic import _ACT


class ActorCriticRecurrent(nn.Module):
    """obs -> RNN -> actor/critic MLP heads (single-head action space)."""

    num_obs: int = 48
    num_actions: int = 12
    rnn_hidden_size: int = 256
    rnn_type: str = "lstm"
    actor_hidden_dims: Sequence[int] = (256, 256)
    critic_hidden_dims: Sequence[int] = (256, 256)
    activation: str = "elu"
    init_noise_std: float = 1.0

    def setup(self):
        self.memory_a = (nn.OptimizedLSTMCell(self.rnn_hidden_size)
                         if self.rnn_type == "lstm"
                         else nn.GRUCell(self.rnn_hidden_size))
        self.memory_c = (nn.OptimizedLSTMCell(self.rnn_hidden_size)
                         if self.rnn_type == "lstm"
                         else nn.GRUCell(self.rnn_hidden_size))
        self.actor_layers = [nn.Dense(d) for d in self.actor_hidden_dims] + [
            nn.Dense(self.num_actions)]
        self.critic_layers = [nn.Dense(d) for d in self.critic_hidden_dims] + [
            nn.Dense(1)]
        self.std = self.param(
            "std", lambda rng: jnp.full((self.num_actions,),
                                        self.init_noise_std))

    def initial_state(self, batch: int):
        return self.initial_state_static(batch)

    def initial_state_static(self, batch: int):
        """Zero carry; plain python (no module scope) so it can be called
        on the unbound module, outside apply()."""
        if self.rnn_type == "lstm":
            z = jnp.zeros((batch, self.rnn_hidden_size))
            return ((z, z), (z, z))
        z = jnp.zeros((batch, self.rnn_hidden_size))
        return (z, z)

    def _mlp(self, layers, x):
        act = _ACT[self.activation]
        for l in layers[:-1]:
            x = act(l(x))
        return layers[-1](x)

    def step(self, carry, obs, dones=None):
        """One timestep: (carry, obs (B, D)) -> (carry, actions_mean,
        value). dones (B,) resets hidden state first (reference
        actor_critic_recurrent `reset`)."""
        ca, cc = carry
        if dones is not None:
            r = dones.astype(jnp.float32)[:, None]
            ca = jax.tree.map(lambda h: h * (1.0 - r), ca)
            cc = jax.tree.map(lambda h: h * (1.0 - r), cc)
        ca, ya = self.memory_a(ca, obs)
        cc, yc = self.memory_c(cc, obs)
        mean = self._mlp(self.actor_layers, ya)
        value = self._mlp(self.critic_layers, yc)
        return (ca, cc), mean, value

    def __call__(self, obs):
        """Init path: single step from zero state."""
        carry = self.initial_state(obs.shape[0])
        carry, mean, value = self.step(carry, obs)
        return mean, self.std, value

    def unroll(self, carry, obs_seq, dones_seq):
        """BPTT over (T, B, D) with per-step done resets — the masked-scan
        equivalent of split_and_pad_trajectories (utils/utils.py:33-71)."""

        def body(mdl, carry, inp):
            obs, dones = inp
            carry, mean, value = mdl.step(carry, obs, dones)
            return carry, (mean, value)

        scan = nn.scan(body, variable_broadcast="params", split_rngs={},
                       in_axes=0, out_axes=0)
        return scan(self, carry, (obs_seq, dones_seq))
