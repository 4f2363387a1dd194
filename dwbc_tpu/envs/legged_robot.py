"""Generic rough-terrain velocity-tracking locomotion env (go1/a1/anymal/
cassie family), TPU-native.

Re-design of the reference LeggedRobot (legged_robot.py:51-922) as a pure
jitted step over a state pytree: decimation-4 PD loop, heading-mode
commands, game-inspired terrain curriculum (move_up/move_down,
:421-441), friction-bucket + base-mass DR, pushes, 187-point height
measurements with yaw-rotated grid and 3-tap min (:777-829), the full
17-term reward set (:832-922) with dt-scaled pruned scales (:548-567),
uniform obs noise (:455-482), and where-masked auto-resets.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core import maths, urdf
from ..sim import dynamics, engine, fused
from ..terrain import terrain as terr
from .legged_config import LeggedRobotCfg


class LeggedState(struct.PyTreeNode):
    robot: engine.BodyState
    episode_length: jax.Array
    common_step: jax.Array
    key: jax.Array
    actions: jax.Array
    last_actions: jax.Array
    last_dof_vel: jax.Array
    torques: jax.Array
    commands: jax.Array          # (N, 4): vx, vy, wyaw, heading
    command_lin_vel_x: jax.Array  # (2,) curriculum-widened vx range
    feet_air_time: jax.Array     # (N, 4)
    last_contacts: jax.Array     # (N, 4) bool
    friction: jax.Array
    added_mass: jax.Array        # (N,)
    inert: dynamics.Inertial
    env_origins: jax.Array
    terrain_levels: jax.Array    # (N,) int32
    terrain_types: jax.Array     # (N,) int32
    foot_forces: jax.Array       # (N, 4, 3)
    body_forces: jax.Array       # (N, nb, 3) net per-body contact force
    contact_carry: Dict[str, jax.Array]  # warm-start contact forces (fused.py)
    episode_reward: jax.Array    # (N,) cumulative reward this episode
    actuator_hidden: jax.Array   # (layers, 2, N*nj, H) LSTM state (or (0,))
    episode_sums: Dict[str, jax.Array]
    reset_buf: jax.Array
    time_out_buf: jax.Array


class LeggedStepOut(NamedTuple):
    obs: jax.Array
    rew: jax.Array
    reset: jax.Array
    time_outs: jax.Array
    episode_stats: Dict[str, jax.Array]
    num_resets: jax.Array


def _resolve_by_name(names, mapping, default=0.0):
    """Substring-keyed resolution like reference legged_robot.py:536-539."""
    out = []
    for n in names:
        v = default
        for k, val in mapping:
            if k in n:
                v = val
        out.append(v)
    return np.asarray(out, np.float32)


class LeggedRobotEnv:
    def __init__(self, cfg: LeggedRobotCfg, num_envs: int = 64, seed: int = 1):
        self.cfg = cfg
        self.num_envs = num_envs
        self.model = urdf.load_urdf(cfg.asset.file,
                                    dof_order=cfg.asset.dof_order,
                                    armature=cfg.asset.armature)
        m = self.model

        # terrain
        self.grid = None
        if cfg.terrain.mesh_type == "grid":
            self.grid = terr.grid_terrain(terr.GridTerrainCfg(
                horizontal_scale=cfg.terrain.horizontal_scale,
                vertical_scale=cfg.terrain.vertical_scale,
                border_size=cfg.terrain.border_size,
                terrain_length=cfg.terrain.terrain_length,
                terrain_width=cfg.terrain.terrain_width,
                num_rows=cfg.terrain.num_rows, num_cols=cfg.terrain.num_cols,
                terrain_proportions=cfg.terrain.terrain_proportions,
                curriculum=cfg.terrain.curriculum, seed=seed))
            self.hf = self.grid.hf
            if cfg.terrain.measure_heights:
                self.hf = self.hf.with_min3()
        else:
            self.hf = terr.flat_plane(
                cfg.env_spacing * (int(np.sqrt(num_envs)) + 2) + 10, 1.0)

        self.default_dof_pos = jnp.asarray(_resolve_by_name(
            m.dof_names, cfg.init_state.default_joint_angles))
        self.p_gains = jnp.asarray(_resolve_by_name(m.dof_names,
                                                    cfg.control.stiffness))
        self.d_gains = jnp.asarray(_resolve_by_name(m.dof_names,
                                                    cfg.control.damping))
        self.torque_limits = jnp.asarray(m.dof_effort)
        self.dof_pos_limits_soft = self._soft_limits()
        q_ref = (jnp.zeros(m.nq).at[6].set(1.0)
                 .at[2].set(cfg.init_state.pos[2])
                 .at[7:].set(self.default_dof_pos))
        self.ctx = engine.build_ctx(m, q_ref)
        self.sim_params = engine.SimParams(
            dt=cfg.sim_dt,
            contact=engine.contact_mod.ContactParams(dt=cfg.sim_dt))

        self.dt = cfg.dt
        self.max_episode_length = cfg.max_episode_length
        self.resample_interval = int(cfg.commands.resampling_time / self.dt)
        self.push_interval = int(np.ceil(cfg.domain_rand.push_interval_s / self.dt))

        # body groups
        feet_names = [b for b in m.body_names
                      if cfg.asset.foot_name in b] or None
        # feet live as geoms (foot bodies are merged into calves)
        self.feet_geoms = jnp.asarray(np.concatenate(
            [m.geoms_of(cfg.asset.foot_name)]))
        assert self.feet_geoms.shape[0] >= 2, "no foot geoms found"
        self.num_feet = int(self.feet_geoms.shape[0])

        def bodies_matching(substrs):
            idx = [i for i, bn in enumerate(m.body_names)
                   if any(s in bn for s in substrs)]
            # include merged-in link names via sites
            for name, site in m.sites.items():
                if any(s in name for s in substrs):
                    idx.append(site.body)
            return np.unique(np.asarray(idx, np.int32))

        self.penalized_bodies = bodies_matching(cfg.asset.penalize_contacts_on) \
            if cfg.asset.penalize_contacts_on else np.zeros((0,), np.int32)
        self.termination_bodies = bodies_matching(
            cfg.asset.terminate_after_contacts_on) \
            if cfg.asset.terminate_after_contacts_on else np.zeros((0,), np.int32)

        # fused SoA physics hot path
        self.fused_step = fused.make_fused_substep(
            m, self.sim_params, self.hf, self.ctx,
            np.asarray(self.feet_geoms))
        # The r2 whole-decimation Pallas kernel was removed in r4 — stale
        # contact law + pathological Mosaic compile time; the fused XLA
        # path is the benched production path (ops/PALLAS_DESIGN.md)
        import os as _os
        if _os.environ.get("DWBC_PALLAS") == "1":
            raise NotImplementedError(
                "the DWBC_PALLAS whole-substep kernel was removed in r4; "
                "see dwbc_tpu/ops/PALLAS_DESIGN.md")

        # LSTM actuator network replacing PD (anymal_c rough,
        # anymal.py:52-78)
        self.actuator_params = None
        if cfg.control.use_actuator_network:
            from ..models import actuator_net
            self.actuator_params = actuator_net.load_params()

        # measurement grid (base frame)
        gx, gy = np.meshgrid(np.asarray(cfg.terrain.measured_points_x),
                             np.asarray(cfg.terrain.measured_points_y),
                             indexing="ij")
        self.height_points = jnp.asarray(
            np.stack([gx.ravel(), gy.ravel()], -1), jnp.float32)

        self.reward_names = [k for k, v in
                             vars(cfg.rewards.scales).items() if v != 0.0]
        # scales multiplied by policy dt (legged_robot.py:552-558);
        # termination excluded from dt scaling? — reference multiplies ALL
        self.reward_scales = {k: getattr(cfg.rewards.scales, k) * self.dt
                              for k in self.reward_names}
        self.num_obs = cfg.num_observations
        self.num_actions = cfg.num_actions
        self.noise_vec = self._noise_scale_vec()
        # logged via the runner's metric_ channel (reference logs
        # extras["episode"]["max_command_x"], legged_robot.py:185)
        self.metric_names = (["max_command_x"]
                             if cfg.commands.curriculum else [])
        # per-terrain-family curriculum-level breakdown (VERDICT r4 item
        # 6: a mean level of 6/10 can hide "slopes at 9, stairs at 3" —
        # the grid's column -> subterrain-family map is static, so the
        # per-family means are cheap masked reductions)
        self._fam_names, self._fam_of_col = [], None
        if self.grid is not None and cfg.terrain.curriculum:
            props = list(np.cumsum(cfg.terrain.terrain_proportions))
            names = ["slope", "rough_slope", "stairs_down", "stairs_up",
                     "obstacles", "stones", "gap", "pit"]
            ncols = cfg.terrain.num_cols
            # exact column->choice map of the grid builder
            # (terrain.py grid_terrain: choice = j/num_cols + 0.001)
            choice = np.arange(ncols) / ncols + 0.001
            fam = np.searchsorted(np.asarray(props), choice, side="right")
            fam = np.minimum(fam, len(names) - 1)
            self._fam_of_col = jnp.asarray(fam, jnp.int32)
            present = sorted(set(fam.tolist()))
            self._fam_names = [(f, names[f]) for f in present]
            self.metric_names = list(self.metric_names) + [
                f"level_{names[f]}" for f in present]

    # ------------------------------------------------------------------

    def _soft_limits(self):
        m = self.model
        lo, hi = np.asarray(m.dof_lower), np.asarray(m.dof_upper)
        mid = (lo + hi) / 2
        r = hi - lo
        s = self.cfg.rewards.soft_dof_pos_limit
        return (jnp.asarray(mid - 0.5 * r * s), jnp.asarray(mid + 0.5 * r * s))

    def _noise_scale_vec(self):
        """(legged_robot.py:455-482)"""
        cfg = self.cfg
        n = cfg.noise
        sc = cfg.normalization
        na = cfg.num_actions
        v = np.zeros(self.num_obs, np.float32)
        lv = n.noise_level
        v[0:3] = n.lin_vel * lv * sc.lin_vel
        v[3:6] = n.ang_vel * lv * sc.ang_vel
        v[6:9] = n.gravity * lv
        v[9:12] = 0.0
        v[12:12 + na] = n.dof_pos * lv * sc.dof_pos
        v[12 + na:12 + 2 * na] = n.dof_vel * lv * sc.dof_vel
        v[12 + 2 * na:12 + 3 * na] = 0.0
        if cfg.terrain.measure_heights:
            v[12 + 3 * na:] = n.height_measurements * lv * sc.height_measurements
        return jnp.asarray(v)

    # ------------------------------------------------------------------

    def init_state(self, key) -> LeggedState:
        cfg = self.cfg
        N = self.num_envs
        m = self.model
        keys = jax.random.split(key, 8)

        # terrain origins (legged_robot.py:717-742)
        if self.grid is not None:
            max_lvl = (cfg.terrain.max_init_terrain_level
                       if cfg.terrain.curriculum else cfg.terrain.num_rows - 1)
            levels = jax.random.randint(keys[0], (N,), 0, max_lvl + 1)
            types = (jnp.arange(N) * cfg.terrain.num_cols // N).astype(jnp.int32)
            t_origins = jnp.asarray(self.grid.env_origins, jnp.float32)
            origins = t_origins[levels, types]
        else:
            side = int(np.ceil(np.sqrt(N)))
            xx, yy = np.meshgrid(np.arange(side), np.arange(side),
                                 indexing="ij")
            origins = jnp.asarray(np.stack(
                [cfg.env_spacing * xx.ravel()[:N],
                 cfg.env_spacing * yy.ravel()[:N],
                 np.zeros(N)], -1), jnp.float32)
            levels = jnp.zeros((N,), jnp.int32)
            types = jnp.zeros((N,), jnp.int32)

        # DR
        dr = cfg.domain_rand
        buckets = jax.random.uniform(keys[1], (dr.friction_buckets,),
                                     minval=dr.friction_range[0],
                                     maxval=dr.friction_range[1])
        bucket_ids = jax.random.randint(keys[2], (N,), 0, dr.friction_buckets)
        friction = (buckets[bucket_ids] if dr.randomize_friction
                    else jnp.ones(N))
        added_mass = (jax.random.uniform(
            keys[3], (N,), minval=dr.added_mass_range[0],
            maxval=dr.added_mass_range[1]) if dr.randomize_base_mass
            else jnp.zeros(N))

        base_inert = dynamics.default_inertial(m)
        mass = jnp.tile(base_inert.mass[None], (N, 1))
        mass = mass.at[:, 0].add(added_mass)
        inert = dynamics.Inertial(
            mass=mass,
            com=jnp.tile(base_inert.com[None], (N, 1, 1)),
            inertia=jnp.tile(base_inert.inertia[None], (N, 1, 1, 1)))

        zeros_n = jnp.zeros((N,))
        state = LeggedState(
            robot=engine.BodyState(q=jnp.zeros((N, m.nq)),
                                   qd=jnp.zeros((N, m.nv))),
            episode_length=jnp.zeros((N,), jnp.int32),
            common_step=jnp.zeros((), jnp.int32),
            key=jax.random.fold_in(key, 1),
            actions=jnp.zeros((N, m.nj)),
            last_actions=jnp.zeros((N, m.nj)),
            last_dof_vel=jnp.zeros((N, m.nj)),
            torques=jnp.zeros((N, m.nj)),
            commands=jnp.zeros((N, 4)),
            command_lin_vel_x=jnp.asarray(cfg.commands.lin_vel_x),
            feet_air_time=jnp.zeros((N, self.num_feet)),
            last_contacts=jnp.zeros((N, self.num_feet), bool),
            friction=friction,
            added_mass=added_mass,
            inert=inert,
            env_origins=origins,
            terrain_levels=levels,
            terrain_types=types,
            foot_forces=jnp.zeros((N, self.num_feet, 3)),
            body_forces=jnp.zeros((N, m.nb, 3)),
            contact_carry=fused.init_contact_carry(m, N),
            episode_reward=zeros_n,
            actuator_hidden=(jnp.zeros((2, 2, N * m.nj, 8))
                             if cfg.control.use_actuator_network
                             else jnp.zeros((0,))),
            episode_sums={k: zeros_n for k in self.reward_names},
            reset_buf=jnp.zeros((N,), bool),
            time_out_buf=jnp.zeros((N,), bool),
        )
        state = self._reset_envs(keys[4], state, jnp.ones((N,), bool),
                                 init=True)
        return state.replace(key=keys[5])

    def _sample_commands(self, key, state) -> jax.Array:
        """(legged_robot.py:337-351); vx range is the curriculum-widened
        one carried in state when commands.curriculum is on."""
        c = self.cfg.commands
        N = self.num_envs
        k1, k2, k3 = jax.random.split(key, 3)
        vx = jax.random.uniform(k1, (N,), minval=state.command_lin_vel_x[0],
                                maxval=state.command_lin_vel_x[1])
        vy = jax.random.uniform(k2, (N,), minval=c.lin_vel_y[0],
                                maxval=c.lin_vel_y[1])
        if c.heading_command:
            last = jax.random.uniform(k3, (N,), minval=c.heading[0],
                                      maxval=c.heading[1])
        else:
            last = jax.random.uniform(k3, (N,), minval=c.ang_vel_yaw[0],
                                      maxval=c.ang_vel_yaw[1])
        cmd = jnp.stack([vx, vy, jnp.zeros(N), jnp.zeros(N)], -1)
        cmd = cmd.at[:, 3 if c.heading_command else 2].set(last)
        # zero small commands
        keep = jnp.linalg.norm(cmd[:, :2], axis=1) > 0.2
        cmd = cmd.at[:, :2].set(cmd[:, :2] * keep[:, None])
        return cmd

    def _reset_envs(self, key, state: LeggedState, mask, init=False):
        cfg = self.cfg
        N = self.num_envs
        m = self.model
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)

        # command curriculum (reference legged_robot.py:443-451, the
        # documented behavior of the commented-out update_command_curriculum
        # called from reset_idx :161-162): once per episode-length of common
        # steps, if the mean tracking reward of the resetting envs exceeds
        # 80% of its ceiling, widen the vx range by 0.5 up to max_curriculum.
        if cfg.commands.curriculum and not init:
            n_sel = jnp.sum(mask.astype(jnp.float32))
            mean_track = (jnp.sum(jnp.where(
                mask, state.episode_sums["tracking_lin_vel"], 0.0))
                / jnp.maximum(n_sel, 1.0)) / self.max_episode_length
            tick = ((state.common_step % int(self.max_episode_length)) == 0)
            grow = (tick & (n_sel > 0)
                    & (mean_track > 0.8 * self.reward_scales["tracking_lin_vel"]))
            mc = cfg.commands.max_curriculum
            lo = jnp.clip(state.command_lin_vel_x[0] - 0.5, -mc, 0.0)
            hi = jnp.clip(state.command_lin_vel_x[1] + 0.5, 0.0, mc)
            state = state.replace(command_lin_vel_x=jnp.where(
                grow, jnp.stack([lo, hi]), state.command_lin_vel_x))

        # terrain curriculum (legged_robot.py:421-441) — not on initial reset
        origins = state.env_origins
        levels = state.terrain_levels
        if self.grid is not None and cfg.terrain.curriculum and not init:
            dist = jnp.linalg.norm(
                state.robot.q[:, :2] - state.env_origins[:, :2], axis=1)
            move_up = dist > self.grid.length / 2
            cmd_dist = (jnp.linalg.norm(state.commands[:, :2], axis=1)
                        * cfg.episode_length_s * 0.5)
            move_down = (dist < cmd_dist) & ~move_up
            new_levels = levels + move_up.astype(jnp.int32) - move_down.astype(jnp.int32)
            rand_levels = jax.random.randint(k5, (N,), 0, cfg.terrain.num_rows)
            new_levels = jnp.where(new_levels >= cfg.terrain.num_rows,
                                   rand_levels, jnp.maximum(new_levels, 0))
            levels = jnp.where(mask, new_levels, levels)
            t_origins = jnp.asarray(self.grid.env_origins, jnp.float32)
            origins = jnp.where(mask[:, None],
                                t_origins[levels, state.terrain_types],
                                origins)

        # dofs: default * U(0.5, 1.5) (legged_robot.py:385)
        scale = jax.random.uniform(k1, (N, m.nj), minval=0.5, maxval=1.5)
        dof_pos = jnp.clip(self.default_dof_pos[None] * scale,
                           jnp.asarray(m.dof_lower), jnp.asarray(m.dof_upper))
        xy_pert = (jax.random.uniform(k2, (N, 2), minval=-1.0, maxval=1.0)
                   if self.grid is not None else jnp.zeros((N, 2)))
        base_xy = origins[:, :2] + xy_pert
        base_z = origins[:, 2] + cfg.init_state.pos[2]
        q = jnp.zeros((N, m.nq)).at[:, 0:2].set(base_xy).at[:, 2].set(base_z)
        q = q.at[:, 6].set(1.0).at[:, 7:].set(dof_pos)
        qd = jnp.zeros((N, m.nv)).at[:, 0:6].set(
            jax.random.uniform(k3, (N, 6), minval=-0.5, maxval=0.5))

        new_cmd = self._sample_commands(k4, state)

        actuator_hidden = state.actuator_hidden
        if cfg.control.use_actuator_network:
            h = actuator_hidden.reshape(2, 2, N, m.nj, 8)
            h = jnp.where(mask[None, None, :, None, None], 0.0, h)
            actuator_hidden = h.reshape(2, 2, N * m.nj, 8)

        return state.replace(
            actuator_hidden=actuator_hidden,
            robot=engine.BodyState(
                q=jnp.where(mask[:, None], q, state.robot.q),
                qd=jnp.where(mask[:, None], qd, state.robot.qd)),
            commands=jnp.where(mask[:, None], new_cmd, state.commands),
            env_origins=origins,
            terrain_levels=levels,
            episode_length=jnp.where(mask, 0, state.episode_length),
            last_actions=jnp.where(mask[:, None], 0.0, state.last_actions),
            last_dof_vel=jnp.where(mask[:, None], 0.0, state.last_dof_vel),
            contact_carry={k: jnp.where(mask[:, None, None], 0.0, v)
                           for k, v in state.contact_carry.items()},
            feet_air_time=jnp.where(mask[:, None], 0.0, state.feet_air_time),
            episode_reward=jnp.where(mask, 0.0, state.episode_reward),
            episode_sums={k: jnp.where(mask, 0.0, v)
                          for k, v in state.episode_sums.items()},
        )

    def _compute_torques(self, state, actions):
        """(legged_robot.py:353-375)"""
        cfg = self.cfg
        scaled = actions * cfg.control.action_scale
        dof_pos = state.robot.q[:, 7:]
        dof_vel = state.robot.qd[:, 6:]
        ct = cfg.control.control_type
        if ct == "P":
            tau = (self.p_gains * (scaled + self.default_dof_pos - dof_pos)
                   - self.d_gains * dof_vel)
        elif ct == "V":
            tau = (self.p_gains * (scaled - dof_vel)
                   - self.d_gains * (dof_vel - state.last_dof_vel) / cfg.sim_dt)
        else:  # T
            tau = scaled
        return jnp.clip(tau, -self.torque_limits, self.torque_limits)

    def _measured_heights(self, q):
        """Yaw-rotated grid, 3-tap min (legged_robot.py:793-829)."""
        base_quat = q[:, 3:7]
        pts = jnp.concatenate(
            [jnp.broadcast_to(self.height_points[None],
                              (q.shape[0],) + self.height_points.shape),
             jnp.zeros((q.shape[0], self.height_points.shape[0], 1))], -1)
        world = maths.quat_apply_yaw(base_quat[:, None, :], pts) + q[:, None, 0:3]
        return self.hf.sample_min3(world[..., 0], world[..., 1])

    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def step(self, state: LeggedState, actions: jax.Array
             ) -> Tuple[LeggedState, LeggedStepOut]:
        cfg = self.cfg
        N = self.num_envs
        m = self.model
        key, k_cmd, k_push, k_reset, k_noise = jax.random.split(state.key, 5)

        actions = jnp.clip(actions, -cfg.normalization.clip_actions,
                           cfg.normalization.clip_actions)
        state = state.replace(actions=actions)

        fric = jnp.maximum(state.friction, 0.0)
        last_dof_vel = state.last_dof_vel

        if cfg.control.use_actuator_network:
            from ..models import actuator_net

            def tau_fn(hidden, q_arr, qd_arr):
                scaled = actions * cfg.control.action_scale
                pos_err = (scaled + self.default_dof_pos - q_arr[:, 7:])
                x = jnp.stack([pos_err.reshape(-1),
                               qd_arr[:, 6:].reshape(-1)], -1)
                tau_flat, hidden = actuator_net.step(self.actuator_params, x,
                                                     hidden)
                tau = tau_flat.reshape(N, m.nj)
                return hidden, jnp.clip(tau, -self.torque_limits,
                                        self.torque_limits)

            tau_carry = state.actuator_hidden
        else:
            def tau_fn(carry, q_arr, qd_arr):
                scaled = actions * cfg.control.action_scale
                dof_pos = q_arr[:, 7:]
                dof_vel = qd_arr[:, 6:]
                ct = cfg.control.control_type
                if ct == "P":
                    tau = (self.p_gains * (scaled + self.default_dof_pos - dof_pos)
                           - self.d_gains * dof_vel)
                elif ct == "V":
                    tau = (self.p_gains * (scaled - dof_vel)
                           - self.d_gains * (dof_vel - last_dof_vel) / cfg.sim_dt)
                else:
                    tau = scaled
                return carry, jnp.clip(tau, -self.torque_limits,
                                       self.torque_limits)

            tau_carry = None

        out, tau_carry_out = self.fused_step(
            state.robot.q, state.robot.qd, tau_fn,
            state.inert.mass, state.inert.com, state.inert.inertia, fric,
            cfg.control.decimation, tau_carry=tau_carry,
            contact_carry=state.contact_carry)
        robot = engine.BodyState(q=out.q, qd=out.qd)
        state = state.replace(robot=robot, torques=out.torques,
                              foot_forces=out.foot_forces,
                              body_forces=out.body_forces,
                              contact_carry=(out.contact_carry
                                             if out.contact_carry is not None
                                             else state.contact_carry))
        if cfg.control.use_actuator_network:
            state = state.replace(actuator_hidden=tau_carry_out)

        episode_length = state.episode_length + 1
        common_step = state.common_step + 1
        state = state.replace(episode_length=episode_length,
                              common_step=common_step)

        base_quat = robot.q[:, 3:7]
        base_lin_vel = maths.quat_rotate_inverse(base_quat, robot.qd[:, 0:3])
        base_ang_vel = maths.quat_rotate_inverse(base_quat, robot.qd[:, 3:6])
        gravity_vec = jnp.asarray([0.0, 0.0, -1.0])
        projected_gravity = maths.quat_rotate_inverse(
            base_quat, jnp.broadcast_to(gravity_vec, (N, 3)))

        # command resample + heading command (legged_robot.py:320-335)
        resample_mask = (episode_length % self.resample_interval) == 0
        new_cmd = self._sample_commands(k_cmd, state)
        commands = jnp.where(resample_mask[:, None], new_cmd, state.commands)
        if cfg.commands.heading_command:
            fwd = maths.quat_rotate(base_quat,
                                    jnp.broadcast_to(jnp.asarray([1.0, 0, 0]),
                                                     (N, 3)))
            heading = jnp.arctan2(fwd[:, 1], fwd[:, 0])
            commands = commands.at[:, 2].set(jnp.clip(
                0.5 * maths.wrap_to_pi(commands[:, 3] - heading), -1.0, 1.0))
        state = state.replace(commands=commands)

        # pushes
        if cfg.domain_rand.push_robots:
            push_now = (common_step % self.push_interval) == 0
            push_vel = jax.random.uniform(
                k_push, (N, 2), minval=-cfg.domain_rand.max_push_vel_xy,
                maxval=cfg.domain_rand.max_push_vel_xy)
            qd_pushed = robot.qd.at[:, 0:2].set(push_vel)
            robot = engine.BodyState(
                q=robot.q, qd=jnp.where(push_now, qd_pushed, robot.qd))
            state = state.replace(robot=robot)

        # measured heights
        if cfg.terrain.measure_heights:
            measured = self._measured_heights(robot.q)
        else:
            measured = jnp.zeros((N, 1))

        # termination (legged_robot.py:138-143)
        term_force = jnp.linalg.norm(
            state.body_forces[:, self.termination_bodies], axis=-1)
        contact_term = (jnp.any(term_force > 1.0, axis=-1)
                        if self.termination_bodies.shape[0] else
                        jnp.zeros((N,), bool))
        time_out = episode_length > self.max_episode_length
        # blow-up guard: see WidowGo1Env.step — NaN states never satisfy
        # the termination comparisons, so they must be caught explicitly
        bad = (~jnp.all(jnp.isfinite(robot.q), -1)
               | ~jnp.all(jnp.isfinite(robot.qd), -1)
               | (jnp.max(jnp.abs(robot.qd[:, :3]), -1) > 15.0))
        reset_buf = contact_term | time_out | bad

        # rewards
        rew, ep_sums, new_air, new_contacts = self._rewards(
            state, base_lin_vel, base_ang_vel, projected_gravity, measured,
            reset_buf, time_out)
        rew = jnp.where(jnp.isfinite(rew) & ~bad, rew, 0.0)
        ep_sums = {k: jnp.where(jnp.isfinite(v), v, 0.0)
                   for k, v in ep_sums.items()}
        state = state.replace(episode_sums=ep_sums, feet_air_time=new_air,
                              last_contacts=new_contacts)

        nres = jnp.sum(reset_buf)
        stats = {"rew_" + k: jnp.sum(jnp.where(reset_buf, v, 0.0))
                 / cfg.episode_length_s
                 for k, v in ep_sums.items()}
        # TRUE episode reward/length sums harvested at termination (the
        # reference's rewbuffer/lenbuffer deques, on_policy_runner.py:140-154)
        ep_rew = state.episode_reward + rew
        stats["reward_sum"] = jnp.sum(jnp.where(reset_buf, ep_rew, 0.0))
        stats["len_sum"] = jnp.sum(jnp.where(
            reset_buf, episode_length.astype(jnp.float32), 0.0))
        state = state.replace(episode_reward=ep_rew)
        stats["terrain_level"] = jnp.mean(state.terrain_levels.astype(jnp.float32))
        if self._fam_of_col is not None:
            # per-family mean level, through the metric_ channel: the
            # runner divides metric_ sums by total resets, so scale by
            # this step's resets to make the division recover a
            # reset-weighted mean (same convention as max_command_x)
            env_fam = self._fam_of_col[state.terrain_types]
            lv = state.terrain_levels.astype(jnp.float32)
            for f, name in self._fam_names:
                in_fam = (env_fam == f)
                mean_lv = (jnp.sum(jnp.where(in_fam, lv, 0.0))
                           / jnp.maximum(jnp.sum(in_fam), 1))
                stats[f"metric_level_{name}"] = (
                    mean_lv * nres.astype(jnp.float32))
        if cfg.commands.curriculum:
            # runner divides by total resets -> reports the current max
            stats["metric_max_command_x"] = (state.command_lin_vel_x[1]
                                             * nres.astype(jnp.float32))

        state = self._reset_envs(k_reset, state, reset_buf)
        state = state.replace(reset_buf=reset_buf, time_out_buf=time_out,
                              key=key)

        obs = self._observations(state, measured, k_noise)
        state = state.replace(last_actions=state.actions,
                              last_dof_vel=state.robot.qd[:, 6:])
        return state, LeggedStepOut(obs=obs, rew=rew, reset=reset_buf,
                                    time_outs=time_out, episode_stats=stats,
                                    num_resets=nres)

    def _observations(self, state, measured, key):
        """(legged_robot.py:209-226)"""
        cfg = self.cfg
        sc = cfg.normalization
        robot = state.robot
        base_quat = robot.q[:, 3:7]
        base_lin_vel = maths.quat_rotate_inverse(base_quat, robot.qd[:, 0:3])
        base_ang_vel = maths.quat_rotate_inverse(base_quat, robot.qd[:, 3:6])
        projected_gravity = maths.quat_rotate_inverse(
            base_quat, jnp.broadcast_to(jnp.asarray([0.0, 0, -1.0]),
                                        (self.num_envs, 3)))
        commands_scale = jnp.asarray([sc.lin_vel, sc.lin_vel, sc.ang_vel])
        obs = jnp.concatenate([
            base_lin_vel * sc.lin_vel,
            base_ang_vel * sc.ang_vel,
            projected_gravity,
            state.commands[:, :3] * commands_scale,
            (robot.q[:, 7:] - self.default_dof_pos[None]) * sc.dof_pos,
            robot.qd[:, 6:] * sc.dof_vel,
            state.actions,
        ], -1)
        if cfg.terrain.measure_heights:
            heights = jnp.clip(
                robot.q[:, 2:3] - 0.5 - measured, -1.0, 1.0) * sc.height_measurements
            obs = jnp.concatenate([obs, heights], -1)
        if cfg.noise.add_noise:
            obs = obs + (2 * jax.random.uniform(key, obs.shape) - 1) * self.noise_vec
        return jnp.clip(obs, -sc.clip_observations, sc.clip_observations)

    def _rewards(self, state, base_lin_vel, base_ang_vel, projected_gravity,
                 measured, reset_buf, time_out):
        """All 17+1 reward terms (legged_robot.py:832-922, cassie.py:43-46);
        active set chosen by nonzero scales, scales pre-multiplied by dt."""
        cfg = self.cfg
        N = self.num_envs
        robot = state.robot
        dof_pos = robot.q[:, 7:]
        dof_vel = robot.qd[:, 6:]
        torques = state.torques
        cmd = state.commands

        # foot contact bookkeeping (legged_robot.py:898-909)
        contact = state.foot_forces[:, :, 2] > 1.0
        contact_filt = contact | state.last_contacts
        first_contact = (state.feet_air_time > 0.0) & contact_filt
        air_time = state.feet_air_time + self.dt

        terms = {}
        terms["lin_vel_z"] = jnp.square(base_lin_vel[:, 2])
        terms["ang_vel_xy"] = jnp.sum(jnp.square(base_ang_vel[:, :2]), -1)
        terms["orientation"] = jnp.sum(jnp.square(projected_gravity[:, :2]), -1)
        base_height = jnp.mean(robot.q[:, 2:3] - measured, axis=1)
        terms["base_height"] = jnp.square(
            base_height - cfg.rewards.base_height_target)
        terms["torques"] = jnp.sum(jnp.square(torques), -1)
        terms["dof_vel"] = jnp.sum(jnp.square(dof_vel), -1)
        terms["dof_acc"] = jnp.sum(
            jnp.square((state.last_dof_vel - dof_vel) / self.dt), -1)
        terms["action_rate"] = jnp.sum(
            jnp.square(state.last_actions - state.actions), -1)
        if self.penalized_bodies.shape[0]:
            pen = jnp.linalg.norm(
                state.body_forces[:, self.penalized_bodies], axis=-1)
            terms["collision"] = jnp.sum((pen > 0.1).astype(jnp.float32), -1)
        else:
            terms["collision"] = jnp.zeros(N)
        terms["termination"] = (reset_buf & ~time_out).astype(jnp.float32)
        lo, hi = self.dof_pos_limits_soft
        out = (-jnp.minimum(dof_pos - lo, 0.0)
               + jnp.maximum(dof_pos - hi, 0.0))
        terms["dof_pos_limits"] = jnp.sum(out, -1)
        terms["dof_vel_limits"] = jnp.sum(jnp.clip(
            jnp.abs(dof_vel) - jnp.asarray(self.model.dof_velocity)
            * cfg.rewards.soft_dof_vel_limit, 0.0, 1.0), -1)
        terms["torque_limits"] = jnp.sum(jnp.maximum(
            jnp.abs(torques) - self.torque_limits
            * cfg.rewards.soft_torque_limit, 0.0), -1)
        lin_err = jnp.sum(jnp.square(cmd[:, :2] - base_lin_vel[:, :2]), -1)
        terms["tracking_lin_vel"] = jnp.exp(-lin_err / cfg.rewards.tracking_sigma)
        ang_err = jnp.square(cmd[:, 2] - base_ang_vel[:, 2])
        terms["tracking_ang_vel"] = jnp.exp(-ang_err / cfg.rewards.tracking_sigma)
        rew_air = jnp.sum((air_time - 0.5) * first_contact, -1)
        rew_air = rew_air * (jnp.linalg.norm(cmd[:, :2], axis=1) > 0.1)
        terms["feet_air_time"] = rew_air
        terms["feet_stumble"] = jnp.any(
            jnp.linalg.norm(state.foot_forces[:, :, :2], axis=-1)
            > 5 * jnp.abs(state.foot_forces[:, :, 2]), axis=-1).astype(jnp.float32)
        terms["stand_still"] = (jnp.sum(
            jnp.abs(dof_pos - self.default_dof_pos[None]), -1)
            * (jnp.linalg.norm(cmd[:, :2], axis=1) < 0.1))
        terms["feet_contact_forces"] = jnp.sum(jnp.maximum(
            jnp.linalg.norm(state.foot_forces, axis=-1)
            - cfg.rewards.max_contact_force, 0.0), -1)
        # cassie: exactly one foot in contact (cassie.py:43-46)
        single = jnp.sum(contact_filt.astype(jnp.int32), -1) == 1
        terms["no_fly"] = single.astype(jnp.float32)

        ep = dict(state.episode_sums)
        rew = jnp.zeros(N)
        for k in self.reward_names:
            if k == "termination":
                continue
            r = terms[k] * self.reward_scales[k]
            rew = rew + r
            ep[k] = ep[k] + r
        if cfg.rewards.only_positive_rewards:
            rew = jnp.maximum(rew, 0.0)
        if "termination" in self.reward_scales:
            r = terms["termination"] * self.reward_scales["termination"]
            rew = rew + r
            ep["termination"] = ep["termination"] + r

        new_air = air_time * ~contact_filt
        return rew, ep, new_air, contact

    def reset(self, key):
        """Env-batch build + initial observation (no physics step — see
        WidowGo1Env.reset for the compile-time rationale)."""
        state = self.init_state(key)
        if self.cfg.terrain.measure_heights:
            measured = self._measured_heights(state.robot.q)
        else:
            measured = jnp.zeros((self.num_envs, 1))
        obs = self._observations(state, measured, state.key)
        return state, obs
