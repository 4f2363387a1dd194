"""Robot<->box two-way contact coupling in the fused substep
(sim/fused.py box path; reference: PhysX co-simulates the per-env box
actor with the robot, widowGo1.py:320-325, 378-392)."""

import jax
import jax.numpy as jnp
import numpy as np

from dwbc_tpu.core.model import free_body_model
from dwbc_tpu.sim import dynamics, engine, fused
from dwbc_tpu.terrain import terrain as terr

BS = 0.1          # box size (widowGo1_config.py:186)
BOX_MASS = 1.0


def _build(n=4):
    """A free 'probe' cube as the robot (8 corner spheres) + coupled box."""
    probe = free_body_model("probe", 2.0, (0.05, 0.05, 0.05))
    hf = terr.flat_plane(20.0, 1.0)
    ctx = engine.build_ctx(probe, jnp.zeros(7).at[6].set(1.0))
    params = engine.SimParams(dt=0.005,
                              contact=engine.contact_mod.ContactParams(dt=0.005))
    step = fused.make_fused_substep(probe, params, hf,
                                    ctx, np.zeros((0,), np.int32),
                                    box_half_extents=(BS / 2,) * 3)
    inert = dynamics.default_inertial(probe)
    mass = jnp.tile(inert.mass[None], (n, 1))
    com = jnp.tile(inert.com[None], (n, 1, 1))
    inertia = jnp.tile(inert.inertia[None], (n, 1, 1, 1))
    box_i = BOX_MASS / 3.0 * ((BS / 2) ** 2 + (BS / 2) ** 2)
    box_i_diag = jnp.full((n, 3), box_i)
    box_mass = jnp.full((n,), BOX_MASS)

    def run(q0, qd0, box_q0, box_qd0, steps):
        def tau_fn(c, q, qd):
            return c, jnp.zeros((n, 0))

        def body(carry, _):
            q, qd, bq, bqd = carry
            out, _, bq, bqd = step(q, qd, tau_fn, mass, com, inertia,
                                   jnp.ones((n,)), 4, box_q=bq, box_qd=bqd,
                                   box_mass=box_mass, box_i_diag=box_i_diag)
            return (out.q, out.qd, bq, bqd), None

        # scan (not a Python loop): one traced policy step, ~40x less compile
        (q, qd, bq, bqd), _ = jax.lax.scan(
            body, (q0, qd0, box_q0, box_qd0), None, length=steps)
        return q, qd, bq, bqd

    return jax.jit(run, static_argnums=4), n


def test_box_rests_on_terrain():
    """A dropped box settles at z ~ half-extent on flat ground."""
    run, n = _build()
    q0 = jnp.zeros((n, 7)).at[:, 6].set(1.0).at[:, 2].set(1.0)  # probe high up
    box_q0 = jnp.zeros((n, 7)).at[:, 6].set(1.0).at[:, 2].set(0.2)
    box_q0 = box_q0.at[:, 0].set(2.0)  # far from the probe
    q, qd, bq, bqd = run(q0, jnp.zeros((n, 6)), box_q0, jnp.zeros((n, 6)), 60)
    z = np.asarray(bq[:, 2])
    assert np.all(np.isfinite(np.asarray(bq)))
    np.testing.assert_allclose(z, BS / 2, atol=0.015)
    assert np.abs(np.asarray(bqd)).max() < 0.1


def test_probe_rests_on_box_two_way():
    """Probe cube dropped onto the box: settles on top (z ~ box top +
    probe half-extent); the box stays grounded and supports the load."""
    run, n = _build()
    # box on the ground, probe just above it
    box_q0 = jnp.zeros((n, 7)).at[:, 6].set(1.0).at[:, 2].set(BS / 2)
    q0 = jnp.zeros((n, 7)).at[:, 6].set(1.0).at[:, 2].set(BS + 0.08)
    q, qd, bq, bqd = run(q0, jnp.zeros((n, 6)), box_q0, jnp.zeros((n, 6)), 100)
    assert np.all(np.isfinite(np.asarray(q)))
    assert np.all(np.isfinite(np.asarray(bq)))
    # box stays put on the ground
    np.testing.assert_allclose(np.asarray(bq[:, 2]), BS / 2, atol=0.02)
    # probe rests on the box, not fallen through to the ground
    z_probe = np.asarray(q[:, 2])
    assert np.all(z_probe > BS + 0.02), z_probe
    assert np.abs(np.asarray(qd[:, :3])).max() < 0.2


def test_probe_pushes_box_sideways():
    """A sliding probe knocks the resting box: momentum transfers (box
    gains velocity in the push direction)."""
    run, n = _build()
    box_q0 = jnp.zeros((n, 7)).at[:, 6].set(1.0).at[:, 2].set(BS / 2)
    q0 = (jnp.zeros((n, 7)).at[:, 6].set(1.0)
          .at[:, 0].set(-0.2).at[:, 2].set(0.05))
    # 3 m/s: ground friction (mu=1 -> ~9.8 m/s^2 decel) eats ~0.1 m/s^2
    # of slide over the 0.10 m approach; 1.5 m/s arrived nearly stopped
    qd0 = jnp.zeros((n, 6)).at[:, 0].set(3.0)  # sliding +x at 3 m/s
    q, qd, bq, bqd = run(q0, qd0, box_q0, jnp.zeros((n, 6)), 40)
    # box moved +x from the impact
    assert np.all(np.asarray(bq[:, 0]) > 0.005)
    assert np.all(np.isfinite(np.asarray(bqd)))


def test_no_box_signature_unchanged():
    """Builder without box_half_extents keeps the original 2-tuple
    return (regression guard for legged_robot/anymal callers)."""
    probe = free_body_model("probe", 2.0, (0.05, 0.05, 0.05))
    hf = terr.flat_plane(20.0, 1.0)
    ctx = engine.build_ctx(probe, jnp.zeros(7).at[6].set(1.0))
    params = engine.SimParams(dt=0.005,
                              contact=engine.contact_mod.ContactParams(dt=0.005))
    step = fused.make_fused_substep(probe, params, hf, ctx,
                                    np.zeros((0,), np.int32))
    inert = dynamics.default_inertial(probe)
    n = 2
    out = step(jnp.zeros((n, 7)).at[:, 6].set(1.0).at[:, 2].set(0.2),
               jnp.zeros((n, 6)),
               lambda c, q, qd: (c, jnp.zeros((n, 0))),
               jnp.tile(inert.mass[None], (n, 1)),
               jnp.tile(inert.com[None], (n, 1, 1)),
               jnp.tile(inert.inertia[None], (n, 1, 1, 1)),
               jnp.ones((n,)), 4)
    assert len(out) == 2
