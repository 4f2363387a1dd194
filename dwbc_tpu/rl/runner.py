"""On-policy training runner: one jitted function per iteration.

Re-design of the reference OnPolicyRunner (on_policy_runner.py:93-180):
the 40-step rollout is a lax.scan fused with the policy forward pass and
env step in ONE compiled program — no per-step host round trips, no
.to(device) copies (SURVEY.md §3.1 hot loops). The PPO update (or the
DAgger phase every dagger_update_freq iters, :129, :166-169) runs as a
second jitted program on the on-device trajectory.

Emits the reference's metric names (Perf/total_fps, Perf/collection time,
Perf/learning_time, Loss/*, Policy/*_noise_std — on_policy_runner.py:
206-231) for direct comparability.
"""

from __future__ import annotations

import functools
import json
import os
import time
from collections import deque
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import actor_critic as ac_lib
from . import ppo as ppo_lib


class Rollout:
    """Static bundle: env + model + ppo cfg; builds the jitted iteration."""

    def __init__(self, env, model: ac_lib.ActorCritic, cfg: ppo_lib.PPOConfig,
                 num_steps: int = 40, mesh=None):
        from ..envs.vec_env import VecEnv
        assert isinstance(env, VecEnv), (
            "env must satisfy the VecEnv protocol (envs/vec_env.py)")
        self.env = env
        self.model = model
        self.cfg = cfg
        self.num_steps = num_steps
        # mesh with >1 device => the PPO update runs under shard_map with
        # device-local minibatches + pmean'd grads (see ppo.update)
        self.mesh = mesh if (mesh is not None
                             and mesh.devices.size > 1) else None

        # arm PD constants for the torque-supervision fk model
        # (on_policy_runner.py:91)
        if cfg.num_heads == 2:
            self.arm_default = (
                jnp.asarray(env.p_gains[12:18]),
                jnp.asarray(env.d_gains[12:18]),
                jnp.asarray(env.default_dof_pos[12:18]),
                jnp.asarray(env.action_scale[12:18]),
            )
        else:
            self.arm_default = None
        # whether env.step takes the curriculum counter argument
        import inspect
        self.has_counter = "counter" in inspect.signature(
            type(env).step).parameters

        # donate the env-state pytree: the rollout consumes the previous
        # state and the caller only keeps the returned one; donation lets
        # XLA alias the (large) state buffers instead of double-buffering.
        # hist_encoding is STATIC (r4): as a traced bool the jnp.where
        # latent select ran BOTH the history-conv and priv encoders every
        # rollout step; two compiled variants (cached) beat dead compute
        # in the hot loop.
        self._collect_jit = jax.jit(self._collect_impl, donate_argnums=(1,),
                                    static_argnums=(5,))
        self._learn = jax.jit(functools.partial(self._learn_impl, False))
        self._learn_dagger = jax.jit(functools.partial(self._learn_impl, True))

    # -- rollout ------------------------------------------------------

    def collect(self, params, env_state, obs, counter, key, hist_encoding):
        return self._collect_jit(params, env_state, obs, counter, key,
                                 bool(hist_encoding))

    def _collect_impl(self, params, env_state, obs, counter, key,
                      hist_encoding):
        """Scan num_steps of (act -> env.step), accumulating Transitions and
        episode diagnostics."""
        env = self.env
        model = self.model

        def step_fn(carry, key_t):
            env_state, obs, stats, nres = carry
            mean = model.apply(params, obs, hist_encoding, method="act_mean")
            std = params["params"]["std"]
            actions = ac_lib.normal_sample(key_t, mean, std)
            logp = ppo_lib.logp_heads(self.cfg, actions, mean, std)
            values = model.apply(params, obs, method="evaluate")
            if self.has_counter:
                env_state, out = env.step(env_state, actions, counter)
            else:
                env_state, out = env.step(env_state, actions)
            arm_rew = getattr(out, "arm_rew", None)
            if self.cfg.num_heads == 2:
                rewards2 = jnp.stack([out.rew, arm_rew], -1)
            else:
                rewards2 = out.rew[..., None]
            extras = getattr(out, "extras", {})
            tr = ppo_lib.Transition(
                obs=obs, actions=actions,
                rewards=rewards2,
                dones=out.reset, time_outs=out.time_outs,
                values=values, log_probs=logp, mu=mean,
                sigma=jnp.broadcast_to(std, mean.shape),
                target_arm_torques=extras.get(
                    "target_arm_torques", jnp.zeros((env.num_envs, 6))),
                current_arm_dof_pos=extras.get(
                    "current_arm_dof_pos", jnp.zeros((env.num_envs, 6))),
                current_arm_dof_vel=extras.get(
                    "current_arm_dof_vel", jnp.zeros((env.num_envs, 6))),
            )
            # episode bookkeeping: the env reports TRUE episode
            # reward/length sums at termination (reference rewbuffer/
            # lenbuffer deques, on_policy_runner.py:140-154)
            stats = dict(stats)
            for k, v in out.episode_stats.items():
                stats[k] = stats[k] + v
            nres = nres + out.num_resets
            return (env_state, out.obs, stats, nres), tr

        arm_names = getattr(env, "arm_reward_names", [])
        metric_names = getattr(env, "metric_names", [])
        stat_keys = (["rew_" + k for k in list(env.reward_names) + list(arm_names)]
                     + ["metric_" + k for k in metric_names])
        if not hasattr(env, "arm_reward_names"):
            stat_keys.append("terrain_level")
        else:
            # termination-cause breakdown (VERDICT r2 item 1a)
            stat_keys += ["term_roll", "term_pitch", "term_z",
                          "term_timeout", "term_bad",
                          # stance diagnostics (r4: is z-sag termination
                          # gating locomotion?)
                          "step_base_height_rel", "step_z_margin_low",
                          "step_vel_x", "step_cmd_x"]
        stats0 = {k: jnp.zeros(()) for k in stat_keys}
        stats0.update(reward_sum=jnp.zeros(()), arm_reward_sum=jnp.zeros(()),
                      len_sum=jnp.zeros(()))
        keys = jax.random.split(key, self.num_steps)
        carry0 = (env_state, obs, stats0, jnp.zeros((), jnp.int32))
        (env_state, obs, stats, nres), traj = jax.lax.scan(step_fn, carry0,
                                                           keys)
        return env_state, obs, traj, stats, nres

    # -- learn --------------------------------------------------------

    def _learn_impl(self, dagger: bool, ppo_state, traj, last_obs, key):
        last_values = self.model.apply(ppo_state.params, last_obs,
                                       method="evaluate")
        if dagger:
            if self.mesh is None:
                return ppo_lib.update_dagger(self.cfg, self.model, ppo_state,
                                             traj, key)
            return self._shard_mapped(
                lambda st, tr, k: ppo_lib.update_dagger(
                    self.cfg, self.model, st, tr, k, axis_name="data"),
                n_batch_args=1)(ppo_state, traj, key)
        # GAE + global advantage normalization stay OUTSIDE shard_map:
        # under jit-with-shardings the batch-wide mean/std reduce to one
        # scalar all-reduce (rollout_storage.py:149-150 semantics)
        returns, advantages = ppo_lib.compute_gae(self.cfg, traj, last_values)
        if self.mesh is None:
            return ppo_lib.update(self.cfg, self.model, ppo_state, traj,
                                  returns, advantages, key,
                                  arm_default=self.arm_default)
        return self._shard_mapped(
            lambda st, tr, rt, ad, k: ppo_lib.update(
                self.cfg, self.model, st, tr, rt, ad, k,
                arm_default=self.arm_default, axis_name="data"),
            n_batch_args=3)(ppo_state, traj, returns, advantages, key)

    def _shard_mapped(self, fn, n_batch_args: int):
        """Wrap a PPO update body in shard_map over the ('data',) mesh:
        args = (ppo_state, *batch_args, key); batch args are (T, N, ...)
        sharded over N, state/key replicated; outputs (PPOState, metrics)
        are replicated (grads are pmean'd inside, so every device computes
        identical parameter updates — the standard DP invariant)."""
        from jax.sharding import PartitionSpec as P
        shard_map = getattr(jax, "shard_map", None)
        if shard_map is None:  # older jax
            from jax.experimental.shard_map import shard_map
        batch = P(None, "data")
        in_specs = (P(),) + (batch,) * n_batch_args + (P(),)
        return shard_map(fn, mesh=self.mesh, in_specs=in_specs,
                         out_specs=(P(), P()), check_vma=False)

    def learn_step(self, ppo_state, traj, last_obs, key, dagger: bool):
        fn = self._learn_dagger if dagger else self._learn
        return fn(ppo_state, traj, last_obs, key)


def _make_writers(log_dir: str, run_config=None):
    """Optional metric sinks matching the reference's wandb + TensorBoard
    pair (on_policy_runner.py:36, :43, :106, :208-231). Both are gated on
    availability/config so headless TPU hosts run without them; the
    always-on sink is metrics.jsonl. `run_config` (env cfg + ppo cfg as a
    dict) is uploaded to wandb like the reference's config-source upload
    (train.py:42-47)."""
    writers = []
    try:  # TensorBoard via torch (baked in); absent in minimal images
        from torch.utils.tensorboard import SummaryWriter

        tb = SummaryWriter(log_dir=log_dir, flush_secs=10)
        writers.append(lambda it, d: [tb.add_scalar(k, v, it)
                                      for k, v in d.items()
                                      if isinstance(v, (int, float))])
    except Exception:
        pass
    if os.environ.get("WANDB_PROJECT"):
        try:  # opt-in wandb (reference train.py:42-47)
            import wandb

            if wandb.run is None:
                wandb.init(project=os.environ["WANDB_PROJECT"],
                           dir=log_dir, config=run_config or {})
            writers.append(lambda it, d: wandb.log(d, step=it))
        except Exception:
            pass
    return writers


class OnPolicyRunner:
    """Host-side training driver: logging, checkpoints, iteration loop."""

    def __init__(self, env, cfg: ppo_lib.PPOConfig = ppo_lib.PPOConfig(),
                 num_steps_per_env: int = 40, log_dir: Optional[str] = None,
                 seed: int = 1, save_interval: int = 500, model=None,
                 mesh=None):
        from ..parallel import distributed as dist

        self.env = env
        self.cfg = cfg
        self.is_main = dist.is_main()
        # checkpoint dir lives on every host (orbax multihost saves are
        # collective); metric sinks open on host 0 only (see below)
        self.log_dir = log_dir
        self.save_interval = save_interval
        if model is not None:
            self.model = model
        elif cfg.num_heads == 2:
            adaptive = bool(getattr(env.cfg.control, "adaptive_arm_gains",
                                    False))
            init_std = tuple([0.8, 1.0, 1.0] * 4 + [1.0] * 6)
            if adaptive:
                init_std = init_std + (1.0,) * 6
            self.model = ac_lib.ActorCritic(
                num_prop=env.num_proprio, num_priv=env.num_priv,
                num_hist=env.cfg.env.history_len,
                adaptive_arm_gains=adaptive, init_std=init_std)
        else:
            from ..models.mlp_actor_critic import MlpActorCritic
            self.model = MlpActorCritic(num_obs=env.num_obs,
                                        num_actions=env.num_actions)
        with dist.host_build():
            key = jax.random.PRNGKey(seed)
            self.key, k_init, k_env = jax.random.split(key, 3)
            dummy_obs = jnp.zeros((1, env.num_obs))
            params = self.model.init(k_init, dummy_obs)
            self.ppo_state = ppo_lib.init_state(cfg, params)
            self.rollout = Rollout(env, self.model, cfg, num_steps_per_env,
                                   mesh=mesh)

        def build_state(build_env, k):
            st, obs0 = build_env.reset(k)
            # init_at_random_ep_len=True (reference train.py:51,
            # on_policy_runner.py:102-104): desynchronize initial episode
            # clocks so resets/timeouts spread over the rollout
            st = st.replace(episode_length=jax.random.randint(
                jax.random.fold_in(k, 7), (build_env.num_envs,), 0,
                int(build_env.max_episode_length), dtype=jnp.int32))
            return st, obs0

        # SPMD: shard the env batch over ('data',), replicate params
        # (parallel/mesh.py; XLA derives the psum reductions — SURVEY §2.5)
        self.mesh = mesh
        if mesh is not None and jax.process_count() > 1:
            # true multi-host path (SURVEY §2.5.3): each host builds ONLY
            # its env shard (global batch never materialized per host) and
            # the shards assemble into global jax.Arrays. Terrain/model are
            # identical everywhere (same cfg+seed); the reset RNG folds in
            # the process index so env draws differ per shard. The state's
            # (2,)-key leaf is "replicated" in sharding terms but
            # deliberately divergent across hosts: it only ever seeds
            # per-env draws of sharded arrays, never replicated compute.
            local_n = dist.host_env_count(env.num_envs)
            with dist.host_build():
                local_env = type(env)(env.cfg, num_envs=local_n, seed=seed)
                l_state, l_obs = build_state(
                    local_env, jax.random.fold_in(k_env, jax.process_index()))
            self.env_state = dist.make_global_array(l_state, mesh,
                                                    env.num_envs)
            self.obs = dist.make_global_array(l_obs, mesh, env.num_envs)
            from ..parallel import mesh as mesh_lib
            self.ppo_state = mesh_lib.replicate(self.ppo_state, mesh)
        elif mesh is not None:
            from ..parallel import mesh as mesh_lib

            with dist.host_build():
                self.env_state, self.obs = build_state(env, k_env)
            self.env_state = mesh_lib.shard_env_state(self.env_state, mesh,
                                                      env.num_envs)
            self.obs = jax.device_put(
                self.obs, jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec("data")))
            self.ppo_state = mesh_lib.replicate(self.ppo_state, mesh)
        else:
            with dist.host_build():
                self.env_state, self.obs = build_state(env, k_env)
            # bulk transfer host-built state to the accelerator (a single
            # fast DMA per leaf, vs hundreds of slow eager dispatches if
            # built there directly — see dist.host_build)
            dev = jax.devices()[0]
            if dev.platform != "cpu":
                self.env_state, self.obs, self.ppo_state, self.key = (
                    jax.device_put(
                        (self.env_state, self.obs, self.ppo_state, self.key),
                        dev))
        self.it = 0
        self.tot_timesteps = 0
        self.tot_time = 0.0
        self.last_collection_time = 0.0
        self.last_learn_time = 0.0
        if self.log_dir and self.is_main:
            os.makedirs(self.log_dir, exist_ok=True)
            self._log_f = open(os.path.join(self.log_dir, "metrics.jsonl"),
                               "a")
            import dataclasses as _dc
            run_config = {
                "env_cfg": (_dc.asdict(env.cfg)
                            if _dc.is_dataclass(env.cfg) else str(env.cfg)),
                "ppo_cfg": (_dc.asdict(cfg) if _dc.is_dataclass(cfg)
                            else getattr(cfg, "_asdict", lambda: str(cfg))()),
                "num_envs": env.num_envs,
                "num_steps_per_env": num_steps_per_env,
            }
            self._writers = _make_writers(self.log_dir, run_config)
        else:
            self._log_f = None
            self._writers = []

    def learn(self, num_iterations: int, log_every: int = 10):
        env = self.env
        for it in range(self.it, self.it + num_iterations):
            counter = jnp.asarray(it + 1, jnp.float32)  # curriculum tick
            dagger = (self.cfg.use_dagger
                      and (it % self.cfg.dagger_update_freq) == 0)
            self.key, k_roll, k_up = jax.random.split(self.key, 3)

            t0 = time.time()
            (self.env_state, self.obs, traj, stats, nres) = self.rollout.collect(
                self.ppo_state.params, self.env_state, self.obs, counter,
                k_roll, hist_encoding=dagger)
            jax.block_until_ready(self.obs)
            collection_time = time.time() - t0

            t0 = time.time()
            self.ppo_state, metrics = self.rollout.learn_step(
                self.ppo_state, traj, self.obs, k_up, dagger)
            jax.block_until_ready(self.ppo_state.counter)
            learn_time = time.time() - t0

            self.tot_timesteps += self.rollout.num_steps * env.num_envs
            self.tot_time += collection_time + learn_time
            self.last_collection_time = collection_time
            self.last_learn_time = learn_time
            self.it = it + 1

            if it % log_every == 0 or it == num_iterations - 1:
                self._log(it, metrics, stats, nres, collection_time, learn_time)
            if self.log_dir and it > 0 and it % self.save_interval == 0:
                self.save(os.path.join(self.log_dir, f"model_{it}"))
        if self.log_dir:
            self.save(os.path.join(self.log_dir, f"model_{self.it}"))

    def _log(self, it, metrics, stats, nres, collection_time, learn_time):
        fps = int(self.rollout.num_steps * self.env.num_envs
                  / max(collection_time + learn_time, 1e-9))
        # ONE host transfer for the ~75 logged scalars: per-scalar float()
        # conversions each paid a device round-trip (~0.3 s/iteration of
        # pure host sync measured in the r4 bench — 28% of iteration time)
        metrics, stats, nres, std, lr = jax.device_get(
            (metrics, stats, nres, self.ppo_state.params["params"]["std"],
             self.ppo_state.learning_rate))
        nres = max(int(nres), 1)
        std = np.asarray(std)
        d = {
            "it": it,
            "Perf/total_fps": fps,
            "Perf/collection time": collection_time,
            "Perf/learning_time": learn_time,
            "Loss/learning_rate": float(lr),
            "Policy/leg_mean_noise_std": float(std[:12].mean()),
            "Policy/arm_mean_noise_std": (float(std[12:].mean())
                                          if std.shape[0] > 12 else 0.0),
            "Train/mean_reward": float(stats["reward_sum"]) / nres,
            "Train/mean_arm_reward": float(stats["arm_reward_sum"]) / nres,
            "Train/mean_episode_length": float(stats["len_sum"]) / nres,
            "Train/dones": nres / self.env.num_envs / self.rollout.num_steps,
        }
        for k, v in metrics.items():
            d["Loss/" + k] = float(v)
        for k, v in stats.items():
            if k.startswith(("rew_", "metric_")):
                d["Episode/" + k] = float(v) / nres
            elif k.startswith("term_"):
                # fraction of terminations with this cause (causes overlap)
                d["Episode/" + k] = float(v) / nres
            elif k.startswith("step_"):
                # per-step per-env mean over the whole rollout
                d["Episode/" + k] = float(v) / self.rollout.num_steps
        if "terrain_level" in stats:  # per-step mean, not per-reset
            d["Episode/terrain_level"] = (float(stats["terrain_level"])
                                          / self.rollout.num_steps)
        line = (f"it {it:5d} | fps {fps:8d} | rew {d['Train/mean_reward']:.3f}"
                f" | arm {d['Train/mean_arm_reward']:.3f}"
                f" | len {d['Train/mean_episode_length']:.1f}"
                f" | collect {collection_time:.3f}s learn {learn_time:.3f}s")
        if self.is_main:
            print(line, flush=True)
        if self._log_f:
            self._log_f.write(json.dumps(d) + "\n")
            self._log_f.flush()
        for w in self._writers:
            w(it, d)

    # -- checkpoint ---------------------------------------------------

    def save(self, path: str):
        """Orbax-style checkpoint of params/opt/iteration (improving on the
        reference by also saving the curriculum counter — SURVEY.md §5)."""
        import orbax.checkpoint as ocp
        ckpt = {
            "params": self.ppo_state.params,
            "opt_state": self.ppo_state.opt_state,
            "hist_opt_state": self.ppo_state.hist_opt_state,
            "learning_rate": self.ppo_state.learning_rate,
            "counter": self.ppo_state.counter,
            "it": jnp.asarray(self.it),
        }
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), ckpt, force=True)
        ckptr.wait_until_finished()

    def load(self, path: str, load_optimizer: bool = True):
        import orbax.checkpoint as ocp
        template = {
            "params": self.ppo_state.params,
            "opt_state": self.ppo_state.opt_state,
            "hist_opt_state": self.ppo_state.hist_opt_state,
            "learning_rate": self.ppo_state.learning_rate,
            "counter": self.ppo_state.counter,
            "it": jnp.asarray(self.it),
        }
        ckptr = ocp.StandardCheckpointer()
        ckpt = ckptr.restore(os.path.abspath(path), target=template)
        self.ppo_state = self.ppo_state.replace(
            params=ckpt["params"],
            opt_state=ckpt["opt_state"] if load_optimizer else self.ppo_state.opt_state,
            hist_opt_state=ckpt["hist_opt_state"] if load_optimizer else self.ppo_state.hist_opt_state,
            learning_rate=ckpt["learning_rate"],
            counter=ckpt["counter"])
        self.it = int(ckpt["it"])

    def force_terminal_schedules(self):
        """Reference RESUME=True semantics (widowGo1_config.py:35, :359,
        :366): jump every counter-driven schedule — env curricula (driven
        by the iteration counter) and PPO mixing/priv-reg/torque-
        supervision (driven by ppo_state.counter) — to terminal values."""
        big = 1_000_000
        self.it = max(self.it, big)
        self.ppo_state = self.ppo_state.replace(
            counter=jnp.maximum(self.ppo_state.counter, big))

    def get_inference_policy(self, stochastic: bool = False):
        params = self.ppo_state.params
        model = self.model

        @jax.jit
        def policy(obs, key=None):
            mean = model.apply(params, obs, True, method="act_mean")
            if stochastic and key is not None:
                return ac_lib.normal_sample(key, mean, params["params"]["std"])
            return mean

        return policy
