"""Explicit vectorized-env contract (reference rsl_rl/env/vec_env.py:36-60).

The reference's VecEnv is an ABC over mutable torch buffers; the
TPU-native contract is FUNCTIONAL: an env is static metadata + two pure
functions over an explicit state pytree. `OnPolicyRunner`/`Rollout`
(rl/runner.py) and `RecurrentPPO` (rl/recurrent.py) drive anything
satisfying this protocol — `LeggedRobotEnv` and `WidowGo1Env` are the
in-repo implementations; runtime checking is available via
`isinstance(env, VecEnv)`.
"""

from __future__ import annotations

from typing import Any, Dict, Protocol, Tuple, runtime_checkable

import jax


@runtime_checkable
class VecEnv(Protocol):
    """Static metadata + pure step/reset.

    Required attributes (reference vec_env.py:37-48 analogues):
      num_envs: int           -- batch size N
      num_obs: int            -- observation width
      num_actions: int        -- action width
      max_episode_length: int -- steps per episode
      reward_names: list[str] -- active reward terms (episode stat keys)

    Dual-reward envs additionally expose `arm_reward_names` and
    `metric_names`, and their StepOut carries `arm_rew` (the widened
    reference contract, widowGo1.py:1199).

    step() returns (new_state, out) where `out` has fields
    obs / rew / reset / time_outs / episode_stats / num_resets
    (see LeggedStepOut, StepOut). Envs whose curricula are driven by the
    learn-iteration counter take it as a third `step` argument
    (widowGo1.py:678-692 semantics); the runner detects this by
    signature.
    """

    num_envs: int
    num_obs: int
    num_actions: int
    max_episode_length: int

    def reset(self, key: jax.Array) -> Tuple[Any, jax.Array]:
        """Build the full env-batch state; returns (state, obs)."""
        ...

    def step(self, state: Any, actions: jax.Array, *counter
             ) -> Tuple[Any, Any]:
        """Pure transition; returns (new_state, StepOut-like)."""
        ...
