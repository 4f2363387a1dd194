"""Pallas fused-substep kernel vs the XLA fused path.

Runs compiled on TPU backends only (set DWBC_TPU_TESTS=1 with a TPU
visible): interpret mode on CPU takes >25 min for this kernel, so CPU
CI relies on the identical-math XLA fused path (tests/test_engine.py)
and this parity check runs wherever a chip exists (also exercised by
tools/check_pallas.py before every bench)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("DWBC_TPU_TESTS") != "1",
    reason="pallas kernel parity needs a TPU (DWBC_TPU_TESTS=1)")

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
