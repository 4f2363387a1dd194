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


def test_box_corners_respect_step_edge():
    """Per-corner terrain sampling at a height discontinuity (ADVICE r3 /
    VERDICT r4 Weak #7): a box dropped straddling a 0.5 m step edge must
    feel the plateau TOP with its trailing corners — CoM past the edge,
    trailing support -> it tips forward and tumbles clear of the wall.
    The old single-center-sample extrapolation (slope clamped to |2|,
    true edge slope 10) fed every corner a phantom tilted plane: the box
    fell through the edge region essentially without rotating (measured
    peak |w| 1.3 rad/s vs 16 with per-corner sampling) and landed
    upright at the wall base.

    Step terrain: height 0.5 for x < 0, 0 for x >= 0 (cell 0.05)."""
    n = 4
    cell = 0.05
    m = 200  # 10 m across, edge at grid midpoint
    h = np.zeros((m, m), np.float32)
    h[: m // 2, :] = 0.5
    hf = terr.Heightfield(height=jnp.asarray(h), cell=cell,
                          origin=(-5.0, -5.0))
    probe = free_body_model("probe", 2.0, (0.05, 0.05, 0.05))
    ctx = engine.build_ctx(probe, jnp.zeros(7).at[6].set(1.0))
    params = engine.SimParams(dt=0.005,
                              contact=engine.contact_mod.ContactParams(dt=0.005))
    step = fused.make_fused_substep(probe, params, hf, ctx,
                                    np.zeros((0,), np.int32),
                                    box_half_extents=(BS / 2,) * 3)
    inert = dynamics.default_inertial(probe)
    mass = jnp.tile(inert.mass[None], (n, 1))
    com = jnp.tile(inert.com[None], (n, 1, 1))
    inertia = jnp.tile(inert.inertia[None], (n, 1, 1, 1))
    box_i = BOX_MASS / 3.0 * 2 * (BS / 2) ** 2
    # probe far away on low ground; box center over the edge ramp with
    # the trailing corner CENTERS (inset by box_r=0.025) on the plateau
    # proper, dropped from just above plateau level
    q0 = (jnp.zeros((n, 7)).at[:, 6].set(1.0)
          .at[:, 0].set(3.0).at[:, 2].set(0.2))
    box_q0 = (jnp.zeros((n, 7)).at[:, 6].set(1.0)
              .at[:, 0].set(-0.03).at[:, 2].set(0.60))

    def tau_fn(c, q, qd):
        return c, jnp.zeros((n, 0))

    def body(carry, _):
        q, qd, bq, bqd = carry
        out, _, bq, bqd = step(q, qd, tau_fn, mass, com, inertia,
                               jnp.ones((n,)), 4, box_q=bq, box_qd=bqd,
                               box_mass=jnp.full((n,), BOX_MASS),
                               box_i_diag=jnp.full((n, 3), box_i))
        return (out.q, out.qd, bq, bqd), (bq, bqd)

    (_, _, bq, bqd), (bq_hist, bqd_hist) = jax.jit(
        lambda c: jax.lax.scan(body, c, None, length=160))(
        (q0, jnp.zeros((n, 6)), box_q0, jnp.zeros((n, 6))))
    bq_hist = np.asarray(bq_hist)   # (T, n, 7)
    bqd_hist = np.asarray(bqd_hist)  # (T, n, 6)
    assert np.all(np.isfinite(bq_hist))
    # trailing-corner support + CoM past the edge must TIP the box: a
    # strong tumble (per-corner: peak |w_y| ~16 rad/s; old center
    # extrapolation: 1.3 — no tip at all)
    assert np.abs(bqd_hist[:, :, 4]).max() > 5.0, (
        "box did not tip about the step edge")
    # ... and throw it clear of the wall (per-corner: lands at x ~0.33;
    # old code dropped it essentially straight down to x ~0.03)
    assert np.all(bq_hist[-1, :, 0] > 0.15), bq_hist[-1, :, 0]
    # at no saved step may any box CORNER be embedded inside the solid
    # step: corner x < edge (minus a 1.5 cm contact-softness margin)
    # while corner z is well below the plateau top
    x4, y4, z4, w4 = (bq_hist[..., 3], bq_hist[..., 4],
                      bq_hist[..., 5], bq_hist[..., 6])
    R = np.stack([
        np.stack([1 - 2 * (y4**2 + z4**2), 2 * (x4 * y4 - z4 * w4),
                  2 * (x4 * z4 + y4 * w4)], -1),
        np.stack([2 * (x4 * y4 + z4 * w4), 1 - 2 * (x4**2 + z4**2),
                  2 * (y4 * z4 - x4 * w4)], -1),
        np.stack([2 * (x4 * z4 - y4 * w4), 2 * (y4 * z4 + x4 * w4),
                  1 - 2 * (x4**2 + y4**2)], -1)], -2)      # (T, n, 3, 3)
    half = BS / 2
    corners = np.array([(sx * half, sy * half, sz * half)
                        for sx in (-1, 1) for sy in (-1, 1)
                        for sz in (-1, 1)])                 # (8, 3)
    cw = (bq_hist[..., None, :3]
          + np.einsum("tnij,cj->tnci", R, corners))         # (T, n, 8, 3)
    # the heightfield solid is the BILINEAR surface: the step ramps from
    # 0.5 at x=-cell to 0 at x=0. A corner is embedded when it sits more
    # than a contact-softness margin below that surface (the old
    # center-extrapolated code let trailing corners free-fall through it)
    h_surf = 0.5 * np.clip(-cw[..., 0] / cell, 0.0, 1.0)
    embedded = cw[..., 2] < h_surf - 0.05
    assert not embedded.any(), (
        "box corner passed through the step wall at steps "
        f"{sorted(set(np.where(embedded)[0].tolist()))[:5]}")
    # and it must end at rest on one level or the other, not midway
    z_end = bq_hist[-1, :, 2]
    on_low = np.abs(z_end - BS / 2) < 0.04
    on_high = np.abs(z_end - (0.5 + BS / 2)) < 0.04
    assert np.all(on_low | on_high), z_end


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
