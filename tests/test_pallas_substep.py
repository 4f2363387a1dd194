"""Pallas fused-substep kernel vs the XLA fused path.

SKIPPED until the kernel is updated to the r3 contact law: sim/fused.py
moved to warm-started directional-Delassus impulses with a tangent-plane
terrain cache (see the r3 "suicide-policy root causes" commit); the
kernel still implements the r2 one-shot law, so step-level parity no
longer holds. The kernel remains opt-in (DWBC_PALLAS=1) and unused by
the production path (the XLA path is the benched fast path since r3).

When re-enabled: runs compiled on TPU backends only (DWBC_TPU_TESTS=1);
interpret mode on CPU takes >25 min for this kernel."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skip(
    reason="pallas kernel implements the r2 contact law; fused moved to "
           "warm-started directional impulses in r3 — kernel update queued")

from dwbc_tpu.core import urdf
from dwbc_tpu.envs.legged_config import go1_flat
from dwbc_tpu.ops import pallas_substep as ps
from dwbc_tpu.sim import dynamics, engine, fused
from dwbc_tpu.terrain import terrain as terr


@pytest.fixture(scope="module")
def setup():
    cfg = go1_flat()
    model = urdf.load_urdf(cfg.asset.file, dof_order=cfg.asset.dof_order,
                           armature=cfg.asset.armature)
    hf = terr.flat_plane(30.0, 1.0)
    from dwbc_tpu.envs.legged_robot import _resolve_by_name
    default = jnp.asarray(_resolve_by_name(model.dof_names,
                                           cfg.init_state.default_joint_angles))
    q_ref = (jnp.zeros(model.nq).at[6].set(1.0)
             .at[2].set(cfg.init_state.pos[2]).at[7:].set(default))
    ctx = engine.build_ctx(model, q_ref)
    params = engine.SimParams(dt=cfg.sim_dt)
    feet = np.concatenate([model.geoms_of(cfg.asset.foot_name)])
    pd = ps.PDParams(
        p_gains=tuple(np.asarray(_resolve_by_name(model.dof_names,
                                                  cfg.control.stiffness))),
        d_gains=tuple(np.asarray(_resolve_by_name(model.dof_names,
                                                  cfg.control.damping))),
        action_scale=(cfg.control.action_scale,) * model.nj,
        default_pos=tuple(np.asarray(default)),
        use_motor_strength=False,
        n_act=model.nj)
    return model, hf, ctx, params, feet, pd, q_ref, default


def test_kernel_matches_fused_path(setup):
    model, hf, ctx, params, feet, pd, q_ref, default = setup
    N = 4
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    q = jnp.tile(q_ref[None], (N, 1))
    q = q.at[:, 7:].add(0.05 * jax.random.normal(k1, (N, model.nj)))
    q = q.at[:, 2].add(jax.random.uniform(k2, (N,), minval=-0.02, maxval=0.05))
    qd = 0.3 * jax.random.normal(k3, (N, model.nv))
    actions = 0.3 * jax.random.normal(key, (N, model.nj))

    inert = dynamics.default_inertial(model)
    mass = jnp.tile(inert.mass[None], (N, 1))
    com = jnp.tile(inert.com[None], (N, 1, 1))
    inertia = jnp.tile(inert.inertia[None], (N, 1, 1, 1))
    friction = jnp.ones((N,))
    n_sub = 2

    # XLA fused reference
    fstep = fused.make_fused_substep(model, params, hf, ctx, feet)

    def tau_fn(carry, q_arr, qd_arr):
        scaled = actions * jnp.asarray(pd.action_scale)
        tau = (jnp.asarray(pd.p_gains) * (scaled + default - q_arr[:, 7:])
               - jnp.asarray(pd.d_gains) * qd_arr[:, 6:])
        return carry, jnp.clip(tau, -jnp.asarray(model.dof_effort),
                               jnp.asarray(model.dof_effort))

    ref, _ = fstep(q, qd, tau_fn, mass, com, inertia, friction, n_sub)

    kstep = ps.make_pallas_step(model, params, hf, ctx, feet, pd,
                                n_substeps=n_sub)
    th, tn = ps.sample_terrain_cache(model, hf, q)
    q2, qd2, foot, tau, bodyf = kstep(q, qd, actions, None, mass, com,
                                      friction, th, tn)

    np.testing.assert_allclose(np.asarray(q2), np.asarray(ref.q),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(qd2), np.asarray(ref.qd),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(tau), np.asarray(ref.torques),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(foot), np.asarray(ref.foot_forces),
                               rtol=2e-2, atol=5e-2)


def test_widow_box_kernel_matches_fused():
    """Box-coupled widowGo1 kernel vs the fused XLA path: robot + box
    co-simulated with two-way contact (fused.py:494-557 in-kernel)."""
    import dataclasses

    from dwbc_tpu.envs.config import TerrainCfg, WidowGo1Cfg
    from dwbc_tpu.envs.widowgo1 import WidowGo1Env

    cfg = dataclasses.replace(WidowGo1Cfg(),
                              terrain=TerrainCfg(mesh_type="plane"))
    env = WidowGo1Env(cfg, num_envs=4, seed=3)
    state, _ = env.reset(jax.random.PRNGKey(0))
    m = env.model
    N = 4
    q, qd = state.robot.q, state.robot.qd
    # place the box overlapping the robot trunk to force robot-box contact
    box_q = state.box.q
    box_q = box_q.at[:, 0:3].set(q[:, 0:3] + jnp.asarray([0.25, 0.0, 0.05]))
    box_qd = jnp.zeros((N, 6)).at[:, 0].set(-0.5)  # moving into the robot
    actions = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (N, 18))
    ms = jnp.ones((N, 18))
    fric = jnp.ones((N,))
    box_i_diag = jnp.stack([state.box_inert.inertia[:, 0, k, k]
                            for k in range(3)], -1)
    n_sub = 4

    def tau_fn(carry, q_arr, qd_arr):
        return carry, env._pd_torques(actions, q_arr[:, 7:7 + 18],
                                      qd_arr[:, 6:6 + 18], ms)

    ref, _, bq_ref, bqd_ref = env.fused_step(
        q, qd, tau_fn, state.inert.mass, state.inert.com,
        state.inert.inertia, fric, n_sub,
        box_q=box_q, box_qd=box_qd, box_mass=state.box_inert.mass[:, 0],
        box_i_diag=box_i_diag)

    pd = ps.PDParams(
        p_gains=tuple(np.asarray(env.p_gains)),
        d_gains=tuple(np.asarray(env.d_gains)),
        action_scale=tuple(np.asarray(env.action_scale)),
        default_pos=tuple(np.asarray(env.default_dof_pos[:18])),
        use_motor_strength=True, n_act=18)
    bhe = (cfg.box.box_size / 2,) * 3
    kstep = ps.make_pallas_step(m, env.sim_params, env.hf, env.ctx,
                                np.asarray(env.feet_geoms), pd,
                                n_substeps=n_sub, box_half_extents=bhe)
    th, tn = ps.sample_terrain_cache(m, env.hf, q)
    bh, bn = ps.sample_box_terrain_cache(env.hf, box_q, bhe)
    q2, qd2, foot, tau, bodyf, bq2, bqd2 = kstep(
        q, qd, actions, ms, state.inert.mass, state.inert.com, fric, th, tn,
        box_q=box_q, box_qd=box_qd, box_mass=state.box_inert.mass[:, 0],
        box_i_diag=box_i_diag, box_h=bh, box_n=bn)

    # the box must actually couple: nonzero relative change vs free fall
    assert float(jnp.abs(bqd2[:, 0] - box_qd[:, 0]).max()) > 1e-4
    np.testing.assert_allclose(np.asarray(q2), np.asarray(ref.q),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(qd2), np.asarray(ref.qd),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(bq2), np.asarray(bq_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(bqd2), np.asarray(bqd_ref),
                               rtol=2e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(foot), np.asarray(ref.foot_forces),
                               rtol=2e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(bodyf), np.asarray(ref.body_forces),
                               rtol=2e-2, atol=5e-2)
