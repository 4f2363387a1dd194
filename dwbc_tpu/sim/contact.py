"""Compliant terrain contact over a static sphere set.

Replaces the PhysX TGS contact solver + trimesh broadphase (SURVEY.md
§2.4) with a TPU-shaped formulation: every robot has a STATIC list of
collision spheres (compiled in core/urdf.py), each tested against the
heightfield in O(1). No broadphase, no variable-length contact lists —
all arrays are (num_geoms, ...) with `where`-masked inactive contacts,
which is exactly what XLA wants.

Force model (per contact point):
  normal:   fn = kp * (-phi) - kd * vn, clamped to [0, fn_max], active
            only when the penetration phi < 0 (Hunt-Crossley-style
            compliant contact; the TGS softness class of the reference's
            solver_type=1, 4 position iters — legged_robot_config.py:190);
  friction: anisotropic-free Coulomb cone: ft = -vt/|vt| * min(mu*fn,
            kt*|vt|)  (viscous inside the cone -> stick behavior at the
            200 Hz physics rate).

The per-env friction coefficient vector is the domain-randomization
surface (reference 1000-bucket friction DR, widowGo1.py:480-496).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.model import RobotModel
from ..terrain.terrain import Heightfield
from .dynamics import Kin


class ContactParams(NamedTuple):
    """Impulse-style contact: each active contact applies the force that
    (given the contact's effective mass) removes its normal approach
    velocity within one dt plus a Baumgarte pushout of the penetration —
    one-iteration sequential impulses with a diagonal Delassus
    approximation. Restitution is 0 (legged_robot_config.py:195)."""

    baumgarte: float = 0.2   # fraction of penetration corrected per step
    # pushout speed ceiling [m/s] — PhysX max_depenetration_velocity
    # (legged_robot_config.py:196). Lets deeply-spawned bodies (feet
    # below terrain at the reference's ABSOLUTE spawn z, widowGo1.py:766)
    # surface gently instead of being launched by the Baumgarte term.
    max_depen_vel: float = 1.0
    # warm-start carry growth limit, in units of m_share*g per substep
    # (sim/fused.py): static/gait loads persist across substeps (true
    # static friction + penetration-free support, the TGS warm-start
    # mechanism) while impact spikes never enter the carry.
    warm_growth: float = 2.0
    # carry decay per substep. A pure integral carry (decay=1) is a
    # MARGINALLY STABLE oscillator (force integrates velocity error,
    # velocity integrates force -> |r| = 1): measured 1.8 rad/s RMS leg
    # joint jitter on a widowGo1 standing at rest, i.e. ~5000 raw
    # energy_square per step for merely existing. decay beta gives
    # |r| = sqrt(beta) damping; the static load share lost to decay is
    # re-supplied by the Baumgarte term at ~(1-beta)*W*dt^2/(m*bg)
    # extra penetration (~0.3 mm per foot).
    warm_decay: float = 0.9
    # under-relaxation of the per-substep impulse correction (Jacobi-
    # coupled contacts: the 4 feet couple through the trunk, so full
    # deadbeat corrections applied simultaneously overshoot and ring;
    # the warm-start carry still converges the average force, relaxation
    # only spreads each correction over ~1/relax substeps — the same
    # shape as TGS's 4 position iterations).
    relax: float = 0.5
    slop: float = 0.001      # penetration tolerance [m]
    fn_max: float = 2000.0   # per-contact force clamp [N]
    vel_eps: float = 1e-4    # tangential speed regularizer
    dt: float = 0.005        # must match SimParams.dt


class ContactOut(NamedTuple):
    geom_force: jax.Array   # (ng, 3) world force on each geom sphere
    body_wrench: jax.Array  # (nb, 6) world [torque; force] at body origins
    geom_pos: jax.Array     # (ng, 3) world sphere centers
    penetration: jax.Array  # (ng,) signed distance (negative = contact)


def geom_world_state(model: RobotModel, kin: Kin) -> Tuple[jax.Array, jax.Array]:
    """World positions and velocities of all collision sphere centers."""
    gb = jnp.asarray(model.geom_body)
    offs = jnp.asarray(model.geom_pos)          # (ng, 3) body-frame
    R = kin.rot[gb]                              # (ng, 3, 3)
    p = kin.pos[gb] + jnp.einsum("gij,gj->gi", R, offs)
    # point velocity: world-frame v_origin + w x r
    w_b = kin.vel[gb][:, :3]
    v_b = kin.vel[gb][:, 3:]
    v_origin_w = jnp.einsum("gij,gj->gi", R, v_b)
    w_w = jnp.einsum("gij,gj->gi", R, w_b)
    v = v_origin_w + jnp.cross(w_w, p - kin.pos[gb])
    return p, v


def terrain_contact(
    model: RobotModel,
    kin: Kin,
    hf: Heightfield,
    friction: jax.Array,          # scalar or (ng,) per-geom friction coeff
    params: ContactParams,
    m_solo: jax.Array,            # (ng,) solo-contact effective mass
    m_body: jax.Array,            # (ng,) body-origin translational eff. mass
) -> ContactOut:
    """Compute world contact forces for one env."""
    p, v = geom_world_state(model, kin)
    radius = jnp.asarray(model.geom_radius)

    h = hf.sample(p[:, 0], p[:, 1])
    n = hf.normal(p[:, 0], p[:, 1])             # (ng, 3)
    phi = (p[:, 2] - h) * n[:, 2] - radius       # approx signed distance

    dt = params.dt
    vn = jnp.sum(v * n, axis=-1)
    active = phi < 0.0
    # split each body's effective mass among its simultaneously active
    # contacts (a resting box face has 4 corner contacts sharing one body;
    # solo-contact impulses would overshoot 4x and launch it)
    gb_idx = jnp.asarray(model.geom_body)
    per_body_active = jnp.zeros((model.nb,)).at[gb_idx].add(active.astype(jnp.float32))
    share = jnp.maximum(per_body_active[gb_idx], 1.0)
    # min(solo, body/share): never exceed what the contact POINT can absorb
    # (overshoot reverses the point's normal velocity -> rocking/rolling
    # energy injection), while splitting collective support across a face.
    m_share = jnp.minimum(m_solo, m_body / share)
    # desired normal acceleration: cancel approach velocity + pushout
    push_v = jnp.minimum(
        params.baumgarte * jnp.maximum(-phi - params.slop, 0.0) / dt,
        params.max_depen_vel)
    acc_n = (-vn) / dt + push_v / dt
    fn = m_share * acc_n
    fn = jnp.where(active, jnp.clip(fn, 0.0, params.fn_max), 0.0)

    vt = v - vn[:, None] * n
    vt_norm = jnp.linalg.norm(vt, axis=-1)
    # stick impulse up to the friction cone
    ft_mag = jnp.minimum(friction * fn, m_share * vt_norm / dt)
    ft = -vt / (vt_norm + params.vel_eps)[:, None] * ft_mag[:, None]

    force = fn[:, None] * n + jnp.where(active[:, None], ft, 0.0)

    # accumulate per-body wrench at body origins (world frame)
    gb = jnp.asarray(model.geom_body)
    nb = model.nb
    torque = jnp.cross(p - kin.pos[gb], force)
    body_f = jnp.zeros((nb, 3)).at[gb].add(force)
    body_n = jnp.zeros((nb, 3)).at[gb].add(torque)
    wrench = jnp.concatenate([body_n, body_f], axis=-1)
    return ContactOut(geom_force=force, body_wrench=wrench, geom_pos=p,
                      penetration=phi)


# ---------------------------------------------------------------------------
# the production (fused-path) impulse law, shared between execution
# strategies: sim/fused.py calls it inline (XLA fuses the chain), and
# ops/contact_pallas.py wraps the SAME function in a pallas_call — the
# "small, stable kernel calling shared reference scalars" re-entry form
# promised by ops/PALLAS_DESIGN.md. Any change to the law automatically
# applies to both paths; there is no physics fork to diverge.


def fused_terrain_law(gp, gv, terrain_cache, fprev, friction, gc, cp, dt):
    """Warm-started directional-Delassus contact impulses for a static
    sphere set against cached terrain tangent planes (the law of
    sim/fused.py substep; PhysX-TGS softness class,
    legged_robot_config.py:190-192).

    All geom-axis quantities are (ng, B) arrays (B = env block):
      gp, gv: 3-tuples of (ng, B) world sphere positions / velocities;
      terrain_cache: (h_anchor (ng, B), normal 3-tuple, ax, ay) from the
        per-policy-step tangent-plane sample;
      fprev: 3-tuple (ng, B) — warm-start carry (applied force with
        growth-clamped normal from the previous substep);
      friction: (B,) per-env Coulomb coefficient (DR surface);
      gc: static geom constants dict:
        radius, m_solo, m_body: (ng, 1);
        W: dict of 6 Delassus components (ng, 1) (see engine.point_W);
        E: (nb, ng) one-hot geom->body incidence (f32).
    Returns (gF, cf_new, active, share_f): applied world forces, new
    carry, the active mask, and the multi-contact mass-share factor
    (consumed by the box-coupling path) — forces are 3-tuples of
    (ng, B)."""
    h_a, nrm, ax, ay = terrain_cache

    def vdot3(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def m_dir(d):
        W = gc["W"]
        q = (W["xx"] * d[0] * d[0] + W["yy"] * d[1] * d[1]
             + W["zz"] * d[2] * d[2]
             + 2.0 * (W["xy"] * d[0] * d[1] + W["xz"] * d[0] * d[2]
                      + W["yz"] * d[1] * d[2]))
        return 1.0 / jnp.maximum(q, 1e-6)

    # evaluate each geom's cached tangent plane at its current position
    dhdx = -nrm[0] / nrm[2]
    dhdy = -nrm[1] / nrm[2]
    h = h_a + dhdx * (gp[0] - ax) + dhdy * (gp[1] - ay)
    phi = (gp[2] - h) * nrm[2] - gc["radius"]
    active = phi < 0.0

    # per-body active count -> shared effective mass (one-hot matmul:
    # no scatter on TPU)
    count_b = jnp.maximum(
        jnp.dot(gc["E"], active.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST), 1.0)      # (nb, B)
    count_g = jnp.dot(gc["E"].T, count_b,
                      precision=jax.lax.Precision.HIGHEST)       # (ng, B)
    m_share = jnp.minimum(gc["m_solo"], gc["m_body"] / count_g)
    share_f = m_share / gc["m_solo"]

    vn = vdot3(gv, nrm)
    push_v = jnp.minimum(
        cp.baumgarte * jnp.maximum(-phi - cp.slop, 0.0) / dt,
        cp.max_depen_vel)
    m_n = share_f * m_dir(nrm)
    vt = tuple(gv[k] - nrm[k] * vn for k in range(3))
    vt_norm = jnp.sqrt(vdot3(vt, vt) + 1e-12)
    t_hat = tuple(vt[k] / vt_norm for k in range(3))
    m_t = share_f * m_dir(t_hat)
    fn_prev = cp.warm_decay * jnp.maximum(vdot3(fprev, nrm), 0.0)
    fdotn = vdot3(fprev, nrm)
    ftp = tuple((fprev[k] - nrm[k] * fdotn) * cp.warm_decay
                for k in range(3))
    fn = jnp.clip(fn_prev + cp.relax * m_n * (push_v - vn) / dt,
                  0.0, cp.fn_max)
    fn = jnp.where(active, fn, 0.0)
    ftv = tuple(ftp[k] + vt[k] * (-cp.relax * m_t / dt) for k in range(3))
    ft_norm = jnp.sqrt(vdot3(ftv, ftv) + 1e-12)
    fscale = jnp.minimum(1.0, friction * fn / ft_norm)
    gF = tuple(jnp.where(active, fn * nrm[k] + ftv[k] * fscale, 0.0)
               for k in range(3))
    # growth-clamped carry: static loads persist, impact spikes don't
    dF = cp.warm_growth * 9.81 * m_n
    fn_c = jnp.minimum(fn, fn_prev + dF)
    fsc_c = jnp.minimum(fscale, (friction * fn_c) / ft_norm)
    cf_new = tuple(jnp.where(active, fn_c * nrm[k] + ftv[k] * fsc_c, 0.0)
                   for k in range(3))
    return gF, cf_new, active, share_f
