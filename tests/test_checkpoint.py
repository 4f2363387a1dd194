"""Orbax checkpoint round-trip of the PPO training state (SURVEY.md §5:
the build improves on torch.save by also persisting the curriculum
counter and learning rate)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from dwbc_tpu.models import actor_critic as ac_lib
from dwbc_tpu.rl import ppo as ppo_lib


def test_ppo_state_roundtrip(tmp_path):
    model = ac_lib.ActorCritic()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 860)))
    cfg = ppo_lib.PPOConfig()
    state = ppo_lib.init_state(cfg, params)
    state = state.replace(counter=jnp.asarray(123, jnp.int32),
                          learning_rate=jnp.asarray(3.7e-4))

    ckpt = {
        "params": state.params,
        "opt_state": state.opt_state,
        "hist_opt_state": state.hist_opt_state,
        "learning_rate": state.learning_rate,
        "counter": state.counter,
        "it": jnp.asarray(7),
    }
    path = os.path.join(str(tmp_path), "model_7")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, ckpt, force=True)
    ckptr.wait_until_finished()

    fresh = ppo_lib.init_state(cfg, model.init(jax.random.PRNGKey(9),
                                               jnp.zeros((1, 860))))
    template = {
        "params": fresh.params,
        "opt_state": fresh.opt_state,
        "hist_opt_state": fresh.hist_opt_state,
        "learning_rate": fresh.learning_rate,
        "counter": fresh.counter,
        "it": jnp.asarray(0),
    }
    restored = ckptr.restore(path, target=template)
    assert int(restored["counter"]) == 123
    assert int(restored["it"]) == 7
    assert abs(float(restored["learning_rate"]) - 3.7e-4) < 1e-9
    old = jax.tree.leaves(state.params)
    new = jax.tree.leaves(restored["params"])
    for a, b in zip(old, new):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
