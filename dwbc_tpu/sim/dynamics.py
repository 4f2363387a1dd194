"""Batched articulated rigid-body dynamics (Featherstone) in pure jnp.

This module replaces the reference's external Isaac Gym PhysX binary
(SURVEY.md §2.4): forward kinematics, O(n) articulated-body forward
dynamics (ABA), inverse dynamics (RNEA), the CRBA joint-space mass matrix
and body jacobians (the reference acquires the latter two from PhysX for
its OSC expert, widowGo1.py:509-510).

Design for TPU/XLA:
  * the kinematic tree is STATIC — loops over bodies unroll at trace time
    into straight-line code with constant parent indices (no gathers);
  * every function takes a SINGLE env's state and is vmapped over the env
    batch by the caller, turning all 6-dim spatial ops into (N, ...)
    vector ops on the VPU;
  * generalized coordinates: q = [base pos(3), base quat xyzw(4),
    joints(nj)], qd = [base lin vel (world), base ang vel (world),
    joint vels] — matching the reference's root-state layout
    (legged_robot.py:497-503) at the API boundary.

Gravity is applied as an external spatial force on every body, so ABA's
returned base acceleration is the true coordinate acceleration.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import maths, spatial
from ..core.model import RobotModel


class Inertial(NamedTuple):
    """Per-body inertial params; separated from RobotModel so that per-env
    domain randomization (base mass/CoM, gripper mass — reference
    widowGo1.py:431-456) is a vector override, not a per-env scene."""

    mass: jax.Array     # (nb,)
    com: jax.Array      # (nb, 3)
    inertia: jax.Array  # (nb, 3, 3) about com


def default_inertial(model: RobotModel) -> Inertial:
    return Inertial(
        mass=jnp.asarray(model.mass),
        com=jnp.asarray(model.com),
        inertia=jnp.asarray(model.inertia),
    )


class Kin(NamedTuple):
    """Forward-kinematics result for one env."""

    rot: jax.Array    # (nb, 3, 3) body->world rotation
    pos: jax.Array    # (nb, 3) body origin in world
    vel: jax.Array    # (nb, 6) spatial velocity [ang; lin], body coords
    # per-body joint transforms (pose of body i in parent coords)
    j_rot: jax.Array  # (nb, 3, 3)
    j_pos: jax.Array  # (nb, 3)


def _joint_transform(model: RobotModel, q_j: jax.Array):
    """Pose of each body frame in its parent body frame, plus motion
    subspace S (6,) per body. Static-shape over all bodies."""
    nb = model.nb
    axis = jnp.asarray(model.joint_axis)          # (nb, 3)
    tree_rot = jnp.asarray(model.tree_rot)        # (nb, 3, 3)
    tree_pos = jnp.asarray(model.tree_pos)        # (nb, 3)
    jtype = jnp.asarray(model.joint_type)         # (nb,)
    qj = jnp.concatenate([jnp.zeros((1,), q_j.dtype), q_j])  # (nb,)

    # revolute: R_axis(q); prismatic: identity rot, translation axis*q
    quat = maths.quat_from_axis_angle(axis, qj)
    r_rev = maths.quat_to_mat(quat)               # (nb, 3, 3)
    is_prism = (jtype == 1)[:, None, None]
    r_joint = jnp.where(is_prism, jnp.eye(3, dtype=q_j.dtype), r_rev)
    p_joint = jnp.where(jtype[:, None] == 1, axis * qj[:, None], 0.0)

    j_rot = tree_rot @ r_joint
    j_pos = tree_pos + (tree_rot @ p_joint[..., None])[..., 0]

    # motion subspace in body-i coords: [axis;0] revolute, [0;axis] prismatic
    zeros = jnp.zeros_like(axis)
    S = jnp.where(
        (jtype == 1)[:, None],
        jnp.concatenate([zeros, axis], -1),
        jnp.concatenate([axis, zeros], -1),
    )  # (nb, 6)
    return j_rot, j_pos, S


def fk(model: RobotModel, q: jax.Array, qd: jax.Array) -> Kin:
    """Forward kinematics + velocities for one env."""
    nb = model.nb
    base_rot = maths.quat_to_mat(q[3:7])
    base_pos = q[0:3]
    # spatial velocity of base in body coords: [R^T w_w; R^T v_w]
    v0 = jnp.concatenate([base_rot.T @ qd[3:6], base_rot.T @ qd[0:3]])

    j_rot, j_pos, S = _joint_transform(model, q[7:])

    rots = [base_rot]
    poss = [base_pos]
    vels = [v0]
    for i in range(1, nb):
        p = int(model.parent[i])
        Ri, pi = j_rot[i], j_pos[i]
        rot_w = rots[p] @ Ri
        pos_w = rots[p] @ pi + poss[p]
        # v_i = X_{p->i} v_p + S qd_i
        vp = vels[p]
        w_p, u_p = vp[:3], vp[3:]
        w_i = Ri.T @ w_p
        u_i = Ri.T @ (u_p + jnp.cross(w_p, pi))
        vi = jnp.concatenate([w_i, u_i]) + S[i] * qd[6 + i - 1]
        rots.append(rot_w)
        poss.append(pos_w)
        vels.append(vi)

    return Kin(
        rot=jnp.stack(rots),
        pos=jnp.stack(poss),
        vel=jnp.stack(vels),
        j_rot=j_rot,
        j_pos=j_pos,
    )


def _spatial_inertias(inert: Inertial) -> jax.Array:
    """(nb, 6, 6) spatial inertias about body origins."""
    return jax.vmap(spatial.spatial_inertia)(inert.mass, inert.com, inert.inertia)


def _gravity_wrench(kin: Kin, inert: Inertial, gravity: jax.Array) -> jax.Array:
    """Per-body gravity as spatial force [n; f] in BODY coords at origin."""
    g_b = jnp.einsum("bij,j->bi", jnp.swapaxes(kin.rot, -1, -2), gravity)  # (nb,3)
    f = inert.mass[:, None] * g_b
    n = jnp.cross(inert.com, f)
    return jnp.concatenate([n, f], axis=-1)


def world_wrench_to_body(kin: Kin, f_ext_world: jax.Array) -> jax.Array:
    """Convert (nb, 6) world-frame wrenches [n; f] at body origins into
    body coordinates."""
    Rt = jnp.swapaxes(kin.rot, -1, -2)
    n = jnp.einsum("bij,bj->bi", Rt, f_ext_world[:, :3])
    f = jnp.einsum("bij,bj->bi", Rt, f_ext_world[:, 3:])
    return jnp.concatenate([n, f], axis=-1)


def aba(
    model: RobotModel,
    inert: Inertial,
    q: jax.Array,
    qd: jax.Array,
    tau: jax.Array,
    f_ext_world: Optional[jax.Array] = None,
    gravity: Tuple[float, float, float] = (0.0, 0.0, -9.81),
    kin: Optional[Kin] = None,
) -> Tuple[jax.Array, Kin]:
    """Articulated-body forward dynamics for one env.

    tau: (nj,) joint torques. f_ext_world: optional (nb, 6) world wrenches
    [torque; force] at body origins (contacts, pushes).
    Returns qdd = (nv,) = [base lin acc (world), base ang acc (world),
    joint accs] and the Kin used.
    """
    nb = model.nb
    if kin is None:
        kin = fk(model, q, qd)
    j_rot, j_pos, S = _joint_transform(model, q[7:])
    I_sp = _spatial_inertias(inert)

    f_bias = _gravity_wrench(kin, inert, jnp.asarray(gravity, q.dtype))
    if f_ext_world is not None:
        f_bias = f_bias + world_wrench_to_body(kin, f_ext_world)

    # pass 1: velocity products and bias forces
    v = kin.vel
    c = []  # velocity-product acceleration per body
    pA = []
    IA = [I_sp[i] for i in range(nb)]
    for i in range(nb):
        if i == 0:
            ci = jnp.zeros((6,), q.dtype)
        else:
            vJ = S[i] * qd[6 + i - 1]
            ci = spatial.cross_motion(v[i], vJ)
        c.append(ci)
        pA.append(spatial.cross_force(v[i], I_sp[i] @ v[i]) - f_bias[i])

    # pass 2: inward articulated inertia recursion
    U = [None] * nb
    d = [None] * nb
    u = [None] * nb
    armature = jnp.asarray(model.dof_armature)
    for i in range(nb - 1, 0, -1):
        p = int(model.parent[i])
        U[i] = IA[i] @ S[i]
        d[i] = S[i] @ U[i] + armature[i - 1]
        u[i] = tau[i - 1] - S[i] @ pA[i]
        Ia = IA[i] - jnp.outer(U[i], U[i]) / d[i]
        pa = pA[i] + Ia @ c[i] + U[i] * (u[i] / d[i])
        Xf = spatial.x_force(j_rot[i], j_pos[i])
        Xm_inv = spatial.x_motion_inv(j_rot[i], j_pos[i])
        IA[p] = IA[p] + Xf @ Ia @ Xm_inv
        pA[p] = pA[p] + Xf @ pa

    # pass 3: outward accelerations
    a0 = jnp.linalg.solve(IA[0], -pA[0])  # base spatial accel, body coords
    a = [a0]
    qdd_j = [None] * (nb - 1)
    for i in range(1, nb):
        p = int(model.parent[i])
        Ri, pi = j_rot[i], j_pos[i]
        ap = a[p]
        w_p, u_p = ap[:3], ap[3:]
        a_in = jnp.concatenate([Ri.T @ w_p, Ri.T @ (u_p + jnp.cross(w_p, pi))]) + c[i]
        qdd_i = (u[i] - U[i] @ a_in) / d[i]
        qdd_j[i - 1] = qdd_i
        a.append(a_in + S[i] * qdd_i)

    # convert base spatial accel (body coords) to world coordinate accels
    R0 = kin.rot[0]
    w_b, v_b = kin.vel[0][:3], kin.vel[0][3:]
    ang_acc_w = R0 @ a0[:3]
    lin_acc_w = R0 @ (a0[3:] + jnp.cross(w_b, v_b))
    joint_qdd = jnp.stack(qdd_j) if qdd_j else jnp.zeros((0,), q.dtype)
    qdd = jnp.concatenate([lin_acc_w, ang_acc_w, joint_qdd])
    return qdd, kin


def rnea_bias(
    model: RobotModel,
    inert: Inertial,
    q: jax.Array,
    qd: jax.Array,
    gravity: Tuple[float, float, float] = (0.0, 0.0, -9.81),
    kin: Optional[Kin] = None,
) -> jax.Array:
    """Nonlinear bias forces C(q,qd)qd + g(q): generalized forces (nv,)
    with the base block expressed in base-body coordinates [n; f]."""
    nb = model.nb
    if kin is None:
        kin = fk(model, q, qd)
    j_rot, j_pos, S = _joint_transform(model, q[7:])
    I_sp = _spatial_inertias(inert)
    f_grav = _gravity_wrench(kin, inert, jnp.asarray(gravity, q.dtype))

    v = kin.vel
    # outward: accelerations with qdd = 0 (velocity products only)
    a = [jnp.zeros((6,), q.dtype)]
    for i in range(1, nb):
        p = int(model.parent[i])
        Ri, pi = j_rot[i], j_pos[i]
        ap = a[p]
        a_in = jnp.concatenate(
            [Ri.T @ ap[:3], Ri.T @ (ap[3:] + jnp.cross(ap[:3], pi))]
        )
        a.append(a_in + spatial.cross_motion(v[i], S[i] * qd[6 + i - 1]))

    f = [
        I_sp[i] @ a[i] + spatial.cross_force(v[i], I_sp[i] @ v[i]) - f_grav[i]
        for i in range(nb)
    ]
    tau = [None] * (nb - 1)
    for i in range(nb - 1, 0, -1):
        p = int(model.parent[i])
        tau[i - 1] = S[i] @ f[i]
        f[p] = f[p] + spatial.x_force(j_rot[i], j_pos[i]) @ f[i]
    joint_tau = jnp.stack(tau) if tau else jnp.zeros((0,), q.dtype)
    return jnp.concatenate([f[0], joint_tau])


def crba(
    model: RobotModel,
    inert: Inertial,
    q: jax.Array,
    kin: Optional[Kin] = None,
) -> jax.Array:
    """Composite-rigid-body mass matrix (nv, nv); base block first, in
    base-body coordinates. Replaces gym.acquire_mass_matrix_tensor
    (reference widowGo1.py:509, arm block sliced at :558)."""
    nb = model.nb
    nv = model.nv
    if kin is None:
        kin = fk(model, q, jnp.zeros((nv,), q.dtype))
    j_rot, j_pos, S = _joint_transform(model, q[7:])
    I_sp = _spatial_inertias(inert)

    Ic = [I_sp[i] for i in range(nb)]
    # X from body i to parent (force transform)
    Xf = [None] + [spatial.x_force(j_rot[i], j_pos[i]) for i in range(1, nb)]
    Xm_inv = [None] + [spatial.x_motion_inv(j_rot[i], j_pos[i]) for i in range(1, nb)]

    # accumulate entries as traced scalars and assemble with ONE stack:
    # the previous .at[].set() chain was ~100 separate dynamic-update-
    # slice ops, each a full (nv, nv) buffer pass per env under vmap
    # (~tens of ms per 4096-env call in the r4 adaptive profile)
    zero = jnp.zeros((), q.dtype)
    rows = [[zero] * nv for _ in range(nv)]
    armature = jnp.asarray(model.dof_armature)
    for i in range(nb - 1, 0, -1):
        p = int(model.parent[i])
        Ic[p] = Ic[p] + Xf[i] @ Ic[i] @ Xm_inv[i]
        F = Ic[i] @ S[i]
        rows[6 + i - 1][6 + i - 1] = S[i] @ F + armature[i - 1]
        jj = i
        while int(model.parent[jj]) > 0:
            pj = int(model.parent[jj])
            F = Xf[jj] @ F
            rows[6 + i - 1][6 + pj - 1] = S[pj] @ F
            rows[6 + pj - 1][6 + i - 1] = S[pj] @ F
            jj = pj
        # coupling with base
        F = Xf[jj] @ F
        for k in range(6):
            rows[k][6 + i - 1] = F[k]
            rows[6 + i - 1][k] = F[k]
    for r in range(6):
        for c in range(6):
            rows[r][c] = Ic[0][r, c]
    return jnp.stack([jnp.stack(r) for r in rows])


def body_jacobian(
    model: RobotModel, q: jax.Array, body: int, offset: Optional[jax.Array] = None
) -> jax.Array:
    """World-frame jacobian (6, nv) of a point on `body`: rows [lin; ang]
    (matching IsaacGym's jacobian row layout, reference widowGo1.py:557).

    Columns: [base lin (world), base ang (world), joints]."""
    kin = fk(model, q, jnp.zeros((model.nv,), q.dtype))
    if offset is None:
        offset = jnp.zeros((3,), q.dtype)
    p_point = kin.pos[body] + kin.rot[body] @ offset

    nv = model.nv
    # column-list assembly, one stack at the end (no dynamic-update-slice
    # chain — see crba)
    zero3 = jnp.zeros((3,), q.dtype)
    lin_cols = [zero3] * nv
    ang_cols = [zero3] * nv
    eye = jnp.eye(3, dtype=q.dtype)
    skew = spatial.skew(p_point - kin.pos[0])
    for k in range(3):
        # base columns: lin vel -> identity; ang vel w -> w x (p - p_base)
        lin_cols[k] = eye[:, k]
        lin_cols[3 + k] = -skew[:, k]
        ang_cols[3 + k] = eye[:, k]

    # joint columns: walk ancestors of `body`
    axis = jnp.asarray(model.joint_axis)
    i = body
    while i > 0:
        ax_w = kin.rot[i] @ axis[i]
        if int(model.joint_type[i]) == 0:  # revolute
            lin_cols[6 + i - 1] = jnp.cross(ax_w, p_point - kin.pos[i])
            ang_cols[6 + i - 1] = ax_w
        else:  # prismatic
            lin_cols[6 + i - 1] = ax_w
        i = int(model.parent[i])
    return jnp.concatenate([jnp.stack(lin_cols, axis=-1),
                            jnp.stack(ang_cols, axis=-1)], axis=0)
