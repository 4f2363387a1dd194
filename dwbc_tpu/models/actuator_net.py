"""ANYdrive v3 actuator network: pure-jnp port of the reference's
TorchScript LSTM (anymal.py:52-78, resources/actuator_nets/
anydrive_v3_lstm.pt).

Per-joint 2-layer LSTM (input [pos_err, vel], hidden 8) + linear torque
head, evaluated every physics substep with per-(env, joint) hidden state.
Weights ship vendored as .npz (converted once from the reference's
TorchScript .pt at asset-vendoring time); no torch at runtime."""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.urdf import ASSETS_ROOT

DEFAULT_NPZ = os.path.join(ASSETS_ROOT,
                           "actuator_nets/anydrive_v3_lstm.npz")

HIDDEN = 8
LAYERS = 2


class ActuatorNetParams(NamedTuple):
    w_ih: Tuple[jnp.ndarray, ...]  # per layer (4H, in)
    w_hh: Tuple[jnp.ndarray, ...]  # per layer (4H, H)
    b: Tuple[jnp.ndarray, ...]     # per layer (4H,) = b_ih + b_hh
    w_out: jnp.ndarray             # (1, H)
    b_out: jnp.ndarray             # (1,)


def load_params(path: str = DEFAULT_NPZ) -> ActuatorNetParams:
    if path.endswith(".pt"):  # convert from a TorchScript checkpoint
        import torch

        sm = torch.jit.load(path, map_location="cpu")
        p = {k: v.detach().numpy() for k, v in sm.named_parameters()}
    else:
        p = dict(np.load(path))
    return ActuatorNetParams(
        w_ih=tuple(jnp.asarray(p[f"lstm.weight_ih_l{i}"]) for i in range(LAYERS)),
        w_hh=tuple(jnp.asarray(p[f"lstm.weight_hh_l{i}"]) for i in range(LAYERS)),
        b=tuple(jnp.asarray(p[f"lstm.bias_ih_l{i}"] + p[f"lstm.bias_hh_l{i}"])
                for i in range(LAYERS)),
        w_out=jnp.asarray(p["linear.weight"]),
        b_out=jnp.asarray(p["linear.bias"]),
    )


def init_hidden(batch: int) -> jnp.ndarray:
    """(layers, 2, batch, H) — h and c stacked."""
    return jnp.zeros((LAYERS, 2, batch, HIDDEN))


def step(params: ActuatorNetParams, x: jnp.ndarray, hidden: jnp.ndarray):
    """x: (B, 2) [pos_err, vel]; hidden: (layers, 2, B, H).
    Returns (torque (B,), new_hidden). PyTorch LSTM gate order i,f,g,o."""
    inp = x
    new_hidden = []
    for l in range(LAYERS):
        h, c = hidden[l, 0], hidden[l, 1]
        gates = inp @ params.w_ih[l].T + h @ params.w_hh[l].T + params.b[l]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        new_hidden.append(jnp.stack([h, c]))
        inp = h
    tau = inp @ params.w_out.T + params.b_out
    return tau[..., 0], jnp.stack(new_hidden)
