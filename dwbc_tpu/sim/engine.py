"""The batched physics engine: one pure jitted substep.

Composes dynamics + contact + joint limits + integration into
`physics_step`, the function the envs call `decimation` times per policy
step (mirroring the reference's gym.simulate loop, widowGo1.py:1175-1191,
but as a fused on-device computation with no host round-trips).

All functions here are single-env; `make_batched_step` vmaps over the env
axis. Per-env physics context (friction, randomized inertials) enters as
vectors — the TPU-native replacement for per-env PhysX property objects.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core import maths
from ..core.model import RobotModel
from ..terrain.terrain import Heightfield
from . import contact as contact_mod
from . import dynamics


class SimParams(NamedTuple):
    dt: float = 0.005               # physics dt (legged_robot_config.py:183)
    gravity: Tuple[float, float, float] = (0.0, 0.0, -9.81)
    contact: contact_mod.ContactParams = contact_mod.ContactParams()
    limit_kp: float = 10000.0       # joint-limit stiffness [1/s^2] (inertia-relative)
    limit_kd: float = 5.0
    max_joint_vel: float = 50.0     # hard safety clamp
    max_base_vel: float = 50.0      # base lin/ang velocity clamp


def geom_effective_masses(model: RobotModel, q_ref: jax.Array):
    """Per-geom contact effective masses 1 / (n^T J M^{-1} J^T n) along the
    vertical, evaluated ONCE at a reference pose. This diagonal Delassus
    approximation is what makes the impulse contact solve O(ng) per step
    with no linear algebra in the hot path (static shapes, VPU-only).

    Returns (m_solo, m_body): m_solo includes the lever-arm rotational
    coupling (right for an isolated contact, e.g. a foot); m_body is the
    translational effective mass at the body origin (right when several
    contacts on one body act together — face contact — and their
    rotational contributions cancel)."""
    from ..core import spatial as sp

    inert = dynamics.default_inertial(model)
    M = dynamics.crba(model, inert, q_ref)
    Minv = jnp.linalg.inv(M + 1e-9 * jnp.eye(model.nv))
    kin = dynamics.fk(model, q_ref, jnp.zeros(model.nv))

    # CRBA's base block is in base-body spatial coords [ang; lin]; build the
    # point jacobian in the same generalized-coord layout.
    def point_m_eff(body: int, p_point: jax.Array) -> jax.Array:
        J = jnp.zeros((3, model.nv))
        R0 = kin.rot[0]
        r_b = R0.T @ (p_point - kin.pos[0])
        J = J.at[:, 0:3].set(-R0 @ sp.skew(r_b))
        J = J.at[:, 3:6].set(R0)
        i = body
        axis = model.joint_axis
        while i > 0:
            ax_w = kin.rot[i] @ jnp.asarray(axis[i])
            if int(model.joint_type[i]) == 0:
                J = J.at[:, 6 + i - 1].set(jnp.cross(ax_w, p_point - kin.pos[i]))
            else:
                J = J.at[:, 6 + i - 1].set(ax_w)
            i = int(model.parent[i])
        n = jnp.array([0.0, 0.0, 1.0])
        Jn = n @ J
        return 1.0 / (Jn @ Minv @ Jn + 1e-9)

    def point_W(body: int, p_point: jax.Array) -> jax.Array:
        """Full 3x3 translational Delassus (inverse-mass) matrix
        W = J M^-1 J^T at the point. The per-contact effective mass along
        any direction d is 1/(d^T W d): the vertical-only scalar
        OVERESTIMATES the mass along tilted normals and tangents (legs
        comply laterally far more than vertically), which made the
        deadbeat contact correction overshoot and ring on slopes
        (measured 43x energy drop from fixing the gain)."""
        J = jnp.zeros((3, model.nv))
        R0 = kin.rot[0]
        r_b = R0.T @ (p_point - kin.pos[0])
        J = J.at[:, 0:3].set(-R0 @ sp.skew(r_b))
        J = J.at[:, 3:6].set(R0)
        i = body
        axis = model.joint_axis
        while i > 0:
            ax_w = kin.rot[i] @ jnp.asarray(axis[i])
            if int(model.joint_type[i]) == 0:
                J = J.at[:, 6 + i - 1].set(jnp.cross(ax_w, p_point - kin.pos[i]))
            else:
                J = J.at[:, 6 + i - 1].set(ax_w)
            i = int(model.parent[i])
        return J @ Minv @ J.T

    m_solo = []
    m_body = []
    w_geom = []
    for gi in range(len(model.geom_body)):
        body = int(model.geom_body[gi])
        offset = jnp.asarray(model.geom_pos[gi])
        p_point = kin.pos[body] + kin.rot[body] @ offset
        m_solo.append(point_m_eff(body, p_point))
        m_body.append(point_m_eff(body, kin.pos[body]))
        w_geom.append(point_W(body, p_point))
    return jnp.stack(m_solo), jnp.stack(m_body), jnp.stack(w_geom)


class PhysCtx(NamedTuple):
    """Static per-model physics context precomputed at a reference pose."""

    m_solo: jax.Array     # (ng,) solo-contact effective masses (vertical)
    m_body: jax.Array     # (ng,) translational effective mass at body origin
    dof_i_eff: jax.Array  # (nj,) joint effective inertias (diag of CRBA M)
    w_geom: Optional[jax.Array] = None  # (ng, 3, 3) translational Delassus


def build_ctx(model: RobotModel, q_ref: jax.Array) -> PhysCtx:
    inert = dynamics.default_inertial(model)
    M = dynamics.crba(model, inert, q_ref)
    m_solo, m_body, w_geom = geom_effective_masses(model, q_ref)
    return PhysCtx(m_solo=m_solo, m_body=m_body, dof_i_eff=jnp.diag(M)[6:],
                   w_geom=w_geom)


class BodyState(struct.PyTreeNode):
    """State of one articulation (batched at env level): q = [pos, quat,
    joints], qd = [lin vel world, ang vel world, joint vels]."""

    q: jax.Array
    qd: jax.Array


def _limit_torques(model: RobotModel, q: jax.Array, qd: jax.Array,
                   params: SimParams, dof_i_eff: jax.Array) -> jax.Array:
    """Penalty enforcement of URDF joint position limits + joint damping
    and dry friction (PhysX enforces limits as hard constraints and
    friction implicitly; compliant/implicit-clamped here).

    All velocity-opposing terms are clamped so they can at most remove the
    joint's current velocity in one dt given its effective inertia — the
    discrete-stability guard that makes e.g. the gripper's dry friction of
    1000 (widowGo1 URDF) act as a clean lock instead of an oscillator."""
    lo = jnp.asarray(model.dof_lower)
    hi = jnp.asarray(model.dof_upper)
    qj, qdj = q[7:], qd[6:]
    below = jnp.minimum(qj - lo, 0.0)
    above = jnp.maximum(qj - hi, 0.0)
    tau = -params.limit_kp * (below + above) * dof_i_eff

    # velocity-opposing magnitude: damping + dry friction + limit damping
    stop = dof_i_eff * jnp.abs(qdj) / params.dt  # torque that zeroes qd
    mag = jnp.asarray(model.dof_damping) * jnp.abs(qdj)
    mag += jnp.asarray(model.dof_friction)
    mag += jnp.where((below < 0) | (above > 0), params.limit_kd * jnp.abs(qdj), 0.0)
    tau -= jnp.sign(qdj) * jnp.minimum(mag, stop)
    return tau


def _integrate(q: jax.Array, qd: jax.Array, qdd: jax.Array, dt: float,
               max_joint_vel: float) -> Tuple[jax.Array, jax.Array]:
    """Semi-implicit Euler with quaternion exponential update."""
    qd = qd + dt * qdd
    qd = qd.at[:6].set(jnp.clip(qd[:6], -50.0, 50.0))
    qd = qd.at[6:].set(jnp.clip(qd[6:], -max_joint_vel, max_joint_vel))
    pos = q[0:3] + dt * qd[0:3]
    quat = maths.quat_integrate(q[3:7], qd[3:6], dt)
    joints = q[7:] + dt * qd[6:]
    return jnp.concatenate([pos, quat, joints]), qd


def physics_substep(
    model: RobotModel,
    params: SimParams,
    hf: Heightfield,
    inert: dynamics.Inertial,
    friction: jax.Array,
    state: BodyState,
    tau: jax.Array,
    ctx: PhysCtx,
    f_ext_world: Optional[jax.Array] = None,
) -> Tuple[BodyState, contact_mod.ContactOut]:
    """One physics dt for one env: contact -> ABA -> integrate."""
    kin = dynamics.fk(model, state.q, state.qd)
    con = contact_mod.terrain_contact(model, kin, hf, friction,
                                      params.contact, ctx.m_solo, ctx.m_body)
    wrench = con.body_wrench
    if f_ext_world is not None:
        wrench = wrench + f_ext_world
    tau_eff = tau + _limit_torques(model, state.q, state.qd, params,
                                   ctx.dof_i_eff)
    qdd, _ = dynamics.aba(
        model, inert, state.q, state.qd, tau_eff,
        f_ext_world=wrench, gravity=params.gravity, kin=kin,
    )
    q, qd = _integrate(state.q, state.qd, qdd, params.dt, params.max_joint_vel)
    return BodyState(q=q, qd=qd), con


def make_batched_step(model: RobotModel, params: SimParams, hf: Heightfield,
                      q_ref: jax.Array):
    """Returns step(state, tau, inert, friction) vmapped over envs.

    state.q: (N, nq), tau: (N, nj), friction: (N,) scalar per env,
    inert: Inertial with leading (N,) axis. q_ref: reference pose for the
    effective-mass precompute (default standing pose)."""
    ctx = build_ctx(model, q_ref)

    def single(state, tau, inert, friction):
        return physics_substep(model, params, hf, inert, friction, state, tau,
                               ctx)

    return jax.vmap(single)
