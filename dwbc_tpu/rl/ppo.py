"""Dual-advantage PPO with Regularized Online Adaptation, TPU-native.

Re-design of the reference algorithm (rsl_rl algorithms/ppo.py) as pure
jitted functions over a PPOState pytree:
  * 2-dim (leg, arm) rewards/values/advantages throughout
    (rollout_storage.py:70-78);
  * advantage mixing with the ramped kappa schedule (ppo.py:199-206,
    301-302);
  * clipped surrogate over per-head ratios + clipped value loss
    (ppo.py:202-216);
  * Regularized Online Adaptation: L2(priv_latent - sg(hist_latent))
    with the 4-number coef schedule (ppo.py:173-180);
  * DAgger-style hist-encoder regression phase with its own Adam
    (ppo.py:79, 265-291);
  * optional arm torque supervision against the OSC expert via the
    analytic PD forward model, weight annealed to 0 (ppo.py:233-239,
    304-324);
  * KL-adaptive learning rate option (ppo.py:183-195);
  * min-std floor after each update (ppo.py:293-296).

Distributed stance: the update is ONE jitted function; with the batch
sharded over the ('data',) mesh axis and params replicated, XLA inserts
the gradient/statistic all-reduces (the explicit-NCCL layer the
reference never had, SURVEY.md §2.5).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models import actor_critic as ac_lib

# see update(): bf16 storage for the permuted obs minibatches
_BF16_OBS = os.environ.get("DWBC_BF16_OBS") == "1"


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Leaf values from WidowGo1RoughCfgPPO.algorithm
    (widowGo1_config.py:343-366), fresh-training (RESUME=False) schedules."""

    clip_param: float = 0.2
    num_learning_epochs: int = 5
    num_mini_batches: int = 4
    value_loss_coef: float = 1.0
    entropy_coef: float = 0.0
    learning_rate: float = 2e-4
    schedule: str = "fixed"  # 'fixed' | 'adaptive'
    desired_kl: Optional[float] = None
    gamma: float = 0.99
    lam: float = 0.95
    max_grad_norm: float = 1.0
    min_policy_std: Tuple[float, ...] = tuple(
        [0.15, 0.25, 0.25] * 4 + [0.2] * 3 + [0.05] * 3)
    mixing_schedule: Tuple[float, float, float] = (1.0, 0.0, 3000.0)
    torque_supervision: bool = False
    torque_supervision_schedule: Tuple[float, float, float] = (0.0, 1000.0, 1000.0)
    adaptive_arm_gains: bool = False
    dagger_update_freq: int = 20
    priv_reg_coef_schedule: Tuple[float, float, float, float] = (0.0, 0.1, 3000.0, 7000.0)
    num_leg_actions: int = 12
    num_heads: int = 2      # 2 = dual leg/arm (widowGo1); 1 = plain PPO
    use_dagger: bool = True
    use_roa: bool = True    # Regularized Online Adaptation losses


class PPOState(struct.PyTreeNode):
    params: Dict
    opt_state: optax.OptState
    hist_opt_state: optax.OptState
    learning_rate: jax.Array
    counter: jax.Array  # update iterations completed


class Transition(NamedTuple):
    """One rollout step, batched (T, N, ...) after the scan."""

    obs: jax.Array               # (..., num_obs)
    actions: jax.Array           # (..., 18)
    rewards: jax.Array           # (..., 2) [leg, arm]
    dones: jax.Array             # (...,) bool
    time_outs: jax.Array         # (...,) bool
    values: jax.Array            # (..., 2)
    log_probs: jax.Array         # (..., 2)
    mu: jax.Array                # (..., 18)
    sigma: jax.Array             # (..., 18)
    target_arm_torques: jax.Array    # (..., 6) zeros if unused
    current_arm_dof_pos: jax.Array   # (..., 6)
    current_arm_dof_vel: jax.Array   # (..., 6)


def make_optimizers(cfg: PPOConfig, params):
    """Main Adam over all params + masked Adam over the history encoder
    (the DAgger phase trains only the adaptation module, ppo.py:79).

    The main chain deliberately ends at scale_by_adam (lr = 1): the
    KL-adaptive learning rate is applied functionally in the minibatch
    step (updates * -lr), so no optimizer hyperparameter is mutated
    inside the scan body (robust to optax internals changing)."""
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.scale_by_adam(),
    )

    def hist_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: any(
                getattr(k, "key", None) == "history_encoder" for k in path),
            params)

    hist_tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.masked(optax.adam(cfg.learning_rate), hist_mask(params)),
    )
    return tx, hist_tx


def init_state(cfg: PPOConfig, params) -> PPOState:
    tx, hist_tx = make_optimizers(cfg, params)
    return PPOState(
        params=params,
        opt_state=tx.init(params),
        hist_opt_state=hist_tx.init(params),
        learning_rate=jnp.asarray(cfg.learning_rate),
        counter=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# schedules (ppo.py:301-305, :178-179)


def mixing_ratio(cfg: PPOConfig, counter):
    s = cfg.mixing_schedule
    return jnp.clip((counter - s[1]) / s[2], 0.0, 1.0) * s[0]


def torque_supervision_weight(cfg: PPOConfig, counter):
    s = cfg.torque_supervision_schedule
    return (1.0 - jnp.clip((counter - s[1]) / s[2], 0.0, 1.0)) * s[0]


def priv_reg_coef(cfg: PPOConfig, counter):
    s = cfg.priv_reg_coef_schedule
    stage = jnp.clip((counter - s[2]) / s[3], 0.0, 1.0)
    return stage * (s[1] - s[0]) + s[0]


def logp_heads(cfg: PPOConfig, actions, mean, std):
    if cfg.num_heads == 1:
        import math as _m
        lp = (-0.5 * jnp.square((actions - mean) / std) - jnp.log(std)
              - 0.5 * _m.log(2 * _m.pi))
        return lp.sum(-1, keepdims=True)
    return ac_lib.log_prob_per_head(actions, mean, std, cfg.num_leg_actions)


def entropy_heads(cfg: PPOConfig, std, batch_shape):
    if cfg.num_heads == 1:
        import math as _m
        ent = (0.5 + 0.5 * _m.log(2 * _m.pi) + jnp.log(std)).sum(-1,
                                                                 keepdims=True)
        return jnp.broadcast_to(ent, batch_shape + (1,))
    return ac_lib.entropy_per_head(std, batch_shape, cfg.num_leg_actions)


# ---------------------------------------------------------------------------
# GAE (rollout_storage.py:136-150) — lax.scan over T, vectorized over N, 2


def compute_gae(cfg: PPOConfig, traj: Transition, last_values: jax.Array):
    """Returns (returns, advantages) with global advantage normalization.

    Timeout bootstrap mirrors ppo.py:133-134: rewards += gamma * values *
    time_out before GAE."""
    rewards = traj.rewards + cfg.gamma * traj.values * traj.time_outs[..., None]
    not_done = 1.0 - traj.dones[..., None].astype(jnp.float32)

    def scan_fn(carry, x):
        advantage, next_values = carry
        reward, value, nd = x
        delta = reward + nd * cfg.gamma * next_values - value
        advantage = delta + nd * cfg.gamma * cfg.lam * advantage
        return (advantage, value), advantage

    (_, _), advs = jax.lax.scan(
        scan_fn,
        (jnp.zeros_like(last_values), last_values),
        (rewards, traj.values, not_done),
        reverse=True,
    )
    returns = advs + traj.values
    advantages = (advs - advs.mean()) / (advs.std() + 1e-8)
    return returns, advantages


# ---------------------------------------------------------------------------
# PPO update


def update(
    cfg: PPOConfig,
    model: ac_lib.ActorCritic,
    state: PPOState,
    traj: Transition,
    returns: jax.Array,
    advantages: jax.Array,
    key: jax.Array,
    arm_default: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
    axis_name: Optional[str] = None,
):
    """One full PPO update: num_learning_epochs x num_mini_batches
    minibatch gradient steps over the flattened (T*N) batch.

    With `axis_name` set this is the SPMD shard-local body (called under
    shard_map with the batch sharded over envs and params replicated):
    each device shuffles and minibatches its LOCAL rows and the gradient
    (+ KL/aux stats) is pmean'd across the mesh per minibatch step —
    mathematically a global minibatch stratified by device. Without it,
    r3's jit-with-shardings formulation made XLA all-gather the ENTIRE
    flattened batch and run the whole update redundantly on every device
    (measured in the r4 HLO audit, tools/scaling_model.py) — the learn
    phase did not scale at all."""
    tx, _ = make_optimizers(cfg, state.params)
    T, N = traj.dones.shape
    B = T * N
    mb_size = B // cfg.num_mini_batches

    if axis_name is not None:
        # decorrelate the per-device local permutations
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
    perm = jax.random.permutation(key, B)

    # Permute the whole batch ONCE, then minibatches are contiguous
    # slices: the reference reuses a single randperm for all epochs
    # (rollout_storage.py:163), so gathering per minibatch step (5 epochs
    # x full-batch gather traffic, measured ~100 ms/update in the r4
    # trace) buys nothing over one up-front gather.
    flat = jax.tree.map(
        lambda x: x.reshape((B,) + x.shape[2:])[perm], traj)
    if _BF16_OBS:
        # experiment (DWBC_BF16_OBS=1): the epoch scan re-reads the
        # permuted obs tensor from HBM every minibatch step (5 epochs x
        # 4 slices x 176 MB at the flagship's 860-d obs); storing it
        # bf16 halves that traffic. The network itself still computes in
        # f32 (cast-on-read); only the stored obs are rounded. OFF by
        # default — training-numerics parity not yet demonstrated.
        flat = flat._replace(obs=flat.obs.astype(jnp.bfloat16))
    f_returns = returns.reshape(B, -1)[perm]
    f_adv = advantages.reshape(B, -1)[perm]
    mix = mixing_ratio(cfg, state.counter)
    reg_coef = priv_reg_coef(cfg, state.counter)
    ts_weight = torque_supervision_weight(cfg, state.counter)

    def loss_fn(params, mb, lr_now):
        obs = mb["obs"].astype(jnp.float32)
        mean = model.apply(params, obs, False, method="act_mean")
        std = params["params"]["std"]
        logp = logp_heads(cfg, mb["actions"], mean, std)
        value = model.apply(params, obs, method="evaluate")
        entropy = entropy_heads(cfg, std, (obs.shape[0],))

        if cfg.use_roa:
            # ROA regularizer (ppo.py:173-180)
            priv_latent = model.apply(params, obs, method="priv_latent")
            hist_latent = jax.lax.stop_gradient(
                model.apply(params, obs, method="hist_latent"))
            diff = priv_latent - hist_latent
            # safe norm: grad of ||x|| at x=0 is NaN otherwise
            priv_reg_loss = jnp.sqrt(jnp.sum(jnp.square(diff), -1) + 1e-12).mean()
        else:
            priv_reg_loss = jnp.zeros(())

        # advantage mixing (ppo.py:199-201)
        adv = mb["adv"]
        if cfg.num_heads == 2:
            mixed = jnp.stack(
                [adv[:, 0] + mix * adv[:, 1], adv[:, 1] + mix * adv[:, 0]], -1)
        else:
            mixed = adv

        ratio = jnp.exp(logp - mb["logp"])
        surr = -mixed * ratio
        surr_clipped = -mixed * jnp.clip(ratio, 1 - cfg.clip_param,
                                         1 + cfg.clip_param)
        surrogate_loss = jnp.maximum(surr, surr_clipped).mean()

        v_clipped = mb["values"] + jnp.clip(value - mb["values"],
                                            -cfg.clip_param, cfg.clip_param)
        v_loss = jnp.maximum(jnp.square(value - mb["returns"]),
                             jnp.square(v_clipped - mb["returns"])).mean()

        loss = (surrogate_loss + cfg.value_loss_coef * v_loss
                - cfg.entropy_coef * entropy.mean()
                + reg_coef * priv_reg_loss)

        aux = dict(value_loss=v_loss, surrogate_loss=surrogate_loss,
                   priv_reg_loss=priv_reg_loss,
                   arm_torques_loss=jnp.zeros(()))

        if cfg.torque_supervision and arm_default is not None:
            # analytic PD forward model of the env's arm torque path
            # (ppo.py:304-324 arm_fk_{fixed,adaptive}_gains)
            p_g, d_g, def_pos, a_scale = arm_default
            act_mean = mean  # same forward pass as the surrogate's
            # NaN/blow-up-proofing (r3/r4 findings): transitions captured
            # on a blow-up-guard step can carry non-finite or ballistic
            # arm state and OSC targets, which used to poison the WHOLE
            # loss even at ts_weight=0 (NaN*0=NaN, and inf entering the
            # sqrt-gain backward). All three are rollout DATA (no grad
            # path), so element-wise masking at source is exact: bad
            # elements contribute 0 to both the loss and the gradient.
            raw_tgt = mb["arm_tau"]
            raw_pos, raw_vel = mb["arm_pos"], mb["arm_vel"]
            # |target| < 100 Nm: the widow arm's effort limits are ~20 Nm,
            # so larger OSC outputs only occur for tumbling/exploding
            # states where the expert itself is meaningless — supervising
            # on them swamps the sane samples by ~6 orders of magnitude
            ok = (jnp.isfinite(raw_tgt) & (jnp.abs(raw_tgt) < 100.0)
                  & jnp.isfinite(raw_pos) & (jnp.abs(raw_pos) < 1e3)
                  & jnp.isfinite(raw_vel) & (jnp.abs(raw_vel) < 50.0))
            tgt = jnp.where(ok, raw_tgt, 0.0)
            arm_pos = jnp.where(ok, raw_pos, 0.0)
            arm_vel = jnp.where(ok, raw_vel, 0.0)
            if cfg.adaptive_arm_gains:
                target_pos = act_mean[:, 12:-6]
                delta_p = act_mean[:, -6:]
                # floor at 1e-6, not 0 (r4 root cause of the adaptive-
                # variant collapse): d/dx sqrt(x) -> inf at the 0-clamp,
                # and inf * ts_weight(=0) = NaN — one env whose policy
                # pushed a gain to the floor NaN-poisoned every gradient
                pg = jnp.maximum(p_g + delta_p, 1e-6)
                dg = 2.0 * jnp.sqrt(pg)
            else:
                target_pos = act_mean[:, -6:]
                pg, dg = p_g, d_g
            arm_tau = (pg * (target_pos * a_scale + def_pos - arm_pos)
                       - dg * arm_vel)
            err = jnp.where(ok, arm_tau - tgt, 0.0)
            denom = jnp.maximum(jnp.sum(ok), 1)
            ts_loss = jnp.sum(jnp.square(err)) / denom
            loss = loss + ts_loss * ts_weight
            aux["arm_torques_loss"] = ts_loss

        # KL for adaptive LR (ppo.py:183-187)
        old_mu, old_sigma = mb["mu"], mb["sigma"]
        kl = jnp.sum(
            jnp.log(std / old_sigma + 1e-5)
            + (jnp.square(old_sigma) + jnp.square(old_mu - mean))
            / (2.0 * jnp.square(std)) - 0.5, axis=-1)
        aux["kl_mean"] = jax.lax.stop_gradient(kl.mean())
        return loss, aux

    def minibatch_step(carry, start):
        params, opt_state, lr, metrics = carry
        sl = functools.partial(jax.lax.dynamic_slice_in_dim,
                               start_index=start, slice_size=mb_size, axis=0)
        mb = {
            "obs": sl(flat.obs),
            "actions": sl(flat.actions),
            "logp": sl(flat.log_probs),
            "values": sl(flat.values),
            "mu": sl(flat.mu),
            "sigma": sl(flat.sigma),
            "returns": sl(f_returns),
            "adv": sl(f_adv),
            "arm_tau": sl(flat.target_arm_torques),
            "arm_pos": sl(flat.current_arm_dof_pos),
            "arm_vel": sl(flat.current_arm_dof_vel),
        }
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mb, lr)
        if axis_name is not None:
            # cross-device gradient/stat reduction (the explicit psum
            # layer of SURVEY §2.5 item 2); params stay replicated
            grads, aux = jax.lax.pmean((grads, aux), axis_name)

        # adaptive-KL LR (ppo.py:189-195)
        if cfg.desired_kl is not None and cfg.schedule == "adaptive":
            kl = aux["kl_mean"]
            lr = jnp.where(kl > cfg.desired_kl * 2.0,
                           jnp.maximum(1e-5, lr / 1.5), lr)
            lr = jnp.where((kl < cfg.desired_kl / 2.0) & (kl > 0.0),
                           jnp.minimum(1e-2, lr * 1.5), lr)
        updates, opt_state = tx.update(grads, opt_state, params)
        # functional lr application (adam chain is unit-lr)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        metrics = {
            "value_loss": metrics["value_loss"] + aux["value_loss"],
            "surrogate_loss": metrics["surrogate_loss"] + aux["surrogate_loss"],
            "priv_reg_loss": metrics["priv_reg_loss"] + aux["priv_reg_loss"],
            "arm_torques_loss": metrics["arm_torques_loss"] + aux["arm_torques_loss"],
        }
        return (params, opt_state, lr, metrics), None

    zero_metrics = {k: jnp.zeros(()) for k in
                    ("value_loss", "surrogate_loss", "priv_reg_loss",
                     "arm_torques_loss")}
    params, opt_state, lr = state.params, state.opt_state, state.learning_rate
    carry = (params, opt_state, lr, zero_metrics)
    # same permutation reused every epoch, like the reference's single
    # randperm (rollout_storage.py:163); scan keeps the compiled graph small
    starts = jnp.tile(jnp.arange(cfg.num_mini_batches) * mb_size,
                      cfg.num_learning_epochs)
    carry, _ = jax.lax.scan(minibatch_step, carry, starts)
    params, opt_state, lr, metrics = carry

    # min-std floor (ppo.py:293-296)
    params = enforce_min_std(cfg, params)

    n_updates = cfg.num_learning_epochs * cfg.num_mini_batches
    metrics = {k: v / n_updates for k, v in metrics.items()}
    metrics["mixing_ratio"] = mix
    metrics["priv_reg_coef"] = reg_coef
    metrics["torque_supervision_weight"] = ts_weight
    metrics["hist_latent_loss"] = jnp.zeros(())
    # per-head advantage diagnostics (r3 verdict: is the leg head's
    # gradient signal being drowned by the kappa-mixed arm advantage?)
    if cfg.num_heads == 2:
        leg_abs = jnp.abs(f_adv[:, 0]).mean()
        arm_abs = jnp.abs(f_adv[:, 1]).mean()
        if axis_name is not None:
            leg_abs, arm_abs = jax.lax.pmean((leg_abs, arm_abs), axis_name)
        metrics["adv_leg_abs"] = leg_abs
        metrics["adv_arm_abs"] = arm_abs
        metrics["adv_leg_mixed_share"] = leg_abs / (
            leg_abs + mix * arm_abs + 1e-8)

    new_state = state.replace(
        params=params, opt_state=opt_state, learning_rate=lr,
        counter=state.counter + 1)
    return new_state, metrics


def update_dagger(
    cfg: PPOConfig,
    model: ac_lib.ActorCritic,
    state: PPOState,
    traj: Transition,
    key: jax.Array,
    axis_name: Optional[str] = None,
):
    """DAgger phase: regress hist latent <- sg(priv latent), training only
    the history encoder (ppo.py:265-291). `axis_name`: shard-local SPMD
    body with pmean'd grads (see `update`)."""
    _, hist_tx = make_optimizers(cfg, state.params)
    T, N = traj.dones.shape
    B = T * N
    mb_size = B // cfg.num_mini_batches
    if axis_name is not None:
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
    perm = jax.random.permutation(key, B)
    flat_obs = traj.obs.reshape(B, -1)[perm]  # one gather (see update)

    def loss_fn(params, obs):
        priv = jax.lax.stop_gradient(
            model.apply(params, obs, method="priv_latent"))
        hist = model.apply(params, obs, method="hist_latent")
        return jnp.sqrt(jnp.sum(jnp.square(priv - hist), -1) + 1e-12).mean()

    def mb_step(carry, start):
        params, opt_state, total = carry
        obs_mb = jax.lax.dynamic_slice_in_dim(flat_obs, start, mb_size, 0)
        loss, grads = jax.value_and_grad(loss_fn)(params, obs_mb)
        if axis_name is not None:
            loss, grads = jax.lax.pmean((loss, grads), axis_name)
        updates, opt_state = hist_tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, total + loss), None

    starts = jnp.tile(jnp.arange(cfg.num_mini_batches) * mb_size,
                      cfg.num_learning_epochs)
    (params, opt_state, total), _ = jax.lax.scan(
        mb_step, (state.params, state.hist_opt_state, jnp.zeros(())), starts)
    n_updates = cfg.num_learning_epochs * cfg.num_mini_batches
    metrics = {"hist_latent_loss": total / n_updates}
    new_state = state.replace(params=params, hist_opt_state=opt_state,
                              counter=state.counter + 1)
    return new_state, metrics


def enforce_min_std(cfg: PPOConfig, params):
    floor = jnp.asarray(cfg.min_policy_std)
    std = params["params"]["std"]
    if floor.shape != std.shape:  # no per-joint floor for this task family
        return params
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.maximum(x, floor)
        if (path and getattr(path[-1], "key", None) == "std") else x,
        params)
