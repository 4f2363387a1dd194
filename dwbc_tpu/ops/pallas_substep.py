"""Pallas TPU kernel: the full physics substep loop, fused.

STATUS (r3): implements the r2 contact law (one-shot impulses, frozen
terrain cache). The production XLA path (sim/fused.py) moved to
warm-started directional-Delassus impulses with a tangent-plane cache
and is the benched fast path; this kernel stays opt-in (DWBC_PALLAS=1)
until it is ported to the same law.

sim/fused.py expresses one substep as ~3k scalar VPU ops over (N,)
arrays; XLA runs them as dozens of fused kernels per substep with the
full state pytree bouncing through HBM between them — at 160 substeps
per training iteration the launch+HBM overhead dominates collect time.

This module compiles the SAME math (identical algorithm and constants —
fused.py is the golden reference, tested against sim/dynamics.py) into
ONE `pallas_call`:

  * env batch tiled (8, 128) — the exact VPU register shape; each
    physical field is one such tile per block;
  * all `decimation` substeps run inside the kernel via fori_loop, so
    q/qd and every intermediate live in VMEM/registers across substeps
    (HBM sees one read of the packed state and one write of the packed
    outputs per policy step);
  * PD control is inlined (torque_fn closures can't cross the kernel
    boundary); the stateful actuator-network path stays on the XLA path;
  * terrain heights/normals are sampled OUTSIDE (XLA gather, once per
    policy step, same cache trick as fused.py) and enter as rows;
  * model geometry (tree, joint frames, gains, limits) is baked at trace
    time as Python floats; the body-level contact reductions are static
    unrolled sums (no one-hot matmuls — MXU-hostile shapes).

Layout: state packs to X (K_in, T, 8, 128) where N = T*1024; outputs
unpack from Y (K_out, T, 8, 128). Grid = (T,), block = one env tile.

Falls back cleanly: envs use this path only when
`use_pallas=True` (auto on TPU backends) and the control law is PD with
static gains; tests run it with interpret=True on CPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.model import RobotModel
from ..sim.engine import PhysCtx, SimParams
from ..sim.fused import (axis_angle_m, cross_force6, cross_motion6,
                         integrate_quat, ldl_solve6, m6add, m6vec, mmul,
                         mmul_t, mtvec, mvec, outer6, quat_to_m, solve3,
                         transform_abi, vadd, vcross, vdot, vscale, vsub)
from ..terrain.terrain import Heightfield

# env tile per block: (8, 128*E). Measured on v5e @4096 envs: E=1 13.6ms
# per policy step, E=2 14.8ms — the kernel is VMEM-bandwidth-bound, so
# wider tiles only grow the live set. E=1 is the default.
_LANE_MULT = int(__import__("os").environ.get("DWBC_PALLAS_LANES", "1"))
TILE = (8, 128 * _LANE_MULT)
TILE_N = TILE[0] * TILE[1]


class PDParams(NamedTuple):
    """Static PD control law baked into the kernel (widowGo1.py:1262-1295 /
    legged_robot.py:353-375 'P' mode)."""

    p_gains: Tuple[float, ...]
    d_gains: Tuple[float, ...]
    action_scale: Tuple[float, ...]
    default_pos: Tuple[float, ...]
    use_motor_strength: bool = True
    n_act: int = 18              # actuated dofs (rest get zero torque)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def make_pallas_step(model: RobotModel, params: SimParams, hf: Heightfield,
                     ctx: PhysCtx, foot_geoms: np.ndarray, pd: PDParams,
                     n_substeps: int, interpret: bool = False,
                     box_half_extents=None):
    """Build step(q, qd, actions, motor_strength, mass, com, friction,
    terrain_h, terrain_n[, box_q, box_qd, box_mass, box_i_diag, box_h,
    box_n]) -> (q, qd, foot_forces (N, nf, 3), torques (N, nj),
        body_forces (N, nb, 3)[, box_q, box_qd]).

    With box_half_extents, the widowGo1 box actor is co-simulated INSIDE
    the kernel with the same two-way coupling as sim/fused.py:494-557:
    robot spheres vs box OBB (reaction wrench on the box), box corners vs
    terrain, Newton-Euler box integration — per-substep, in VMEM.

    Inertia tensors about the COM are baked as constants (domain
    randomization touches masses and COMs only — widowGo1.py:431-466)."""

    nb = model.nb
    nj = model.nj
    nq, nv = 7 + nj, 6 + nj
    ng = len(model.geom_body)
    parent = [int(p) for p in model.parent]
    jtype = [int(t) for t in model.joint_type]
    axis = [tuple(float(a) for a in model.joint_axis[i]) for i in range(nb)]
    tree_rot = [tuple(tuple(float(v) for v in row) for row in model.tree_rot[i])
                for i in range(nb)]
    tree_pos = [tuple(float(v) for v in model.tree_pos[i]) for i in range(nb)]
    armature = [float(a) for a in model.dof_armature]
    damping = [float(d) for d in model.dof_damping]
    friction_j = [float(f) for f in model.dof_friction]
    dof_lo = [float(v) for v in model.dof_lower]
    dof_hi = [float(v) for v in model.dof_upper]
    effort = [float(v) for v in model.dof_effort]
    geom_body = [int(b) for b in model.geom_body]
    geom_pos = [tuple(float(v) for v in model.geom_pos[i]) for i in range(ng)]
    geom_radius = [float(r) for r in model.geom_radius]
    geoms_of_body = [[g for g, b in enumerate(geom_body) if b == i]
                     for i in range(nb)]
    m_solo = [float(v) for v in np.asarray(ctx.m_solo)]
    m_body_eff = [float(v) for v in np.asarray(ctx.m_body)]
    i_eff = [float(v) for v in np.asarray(ctx.dof_i_eff)]
    foot_geoms = [int(g) for g in np.asarray(foot_geoms)]
    nf = len(foot_geoms)
    inert_c = np.asarray(
        jax.tree.map(lambda x: x, _default_inertia_const(model)))  # (nb,3,3)
    inert_const = [tuple(tuple(float(inert_c[b, i, j]) for j in range(3))
                         for i in range(3)) for b in range(nb)]
    gvec = params.gravity
    dt = params.dt
    cp = params.contact
    na = pd.n_act

    with_box = box_half_extents is not None
    if with_box:
        bhe = tuple(float(h) for h in box_half_extents)
        box_r = 0.5 * min(bhe)
        box_corners = [
            (sx * (bhe[0] - box_r), sy * (bhe[1] - box_r),
             sz * (bhe[2] - box_r))
            for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)]

    # ---- packed row layout ------------------------------------------------
    # inputs
    o = {}
    k = 0
    def _alloc(name, n):
        nonlocal k
        o[name] = k
        k += n
    _alloc("q", nq)
    _alloc("qd", nv)
    _alloc("act", na)
    _alloc("ms", na if pd.use_motor_strength else 0)
    _alloc("mass", nb)
    _alloc("com", 3 * nb)
    _alloc("fric", 1)
    _alloc("h", ng)
    _alloc("nrm", 3 * ng)
    if with_box:
        _alloc("bq", 7)
        _alloc("bqd", 6)
        _alloc("bmass", 1)
        _alloc("bidiag", 3)
        _alloc("bh", 8)        # terrain height under each box corner
        _alloc("bn", 24)       # terrain normal under each box corner
    K_IN = k
    # outputs
    po = {}
    k = 0
    def _oalloc(name, n):
        nonlocal k
        po[name] = k
        k += n
    _oalloc("q", nq)
    _oalloc("qd", nv)
    _oalloc("tau", nj)
    _oalloc("foot", 3 * nf)
    _oalloc("bodyf", 3 * nb)
    if with_box:
        _oalloc("bq", 7)
        _oalloc("bqd", 6)
    K_OUT = k

    def kernel(x_ref, y_ref):
        def row(name, i=0):
            return x_ref[o[name] + i, 0]

        # unpack state into carry dicts of (8, 128) tiles
        q0 = dict(
            pos=tuple(row("q", i) for i in range(3)),
            quat=tuple(row("q", 3 + i) for i in range(4)),
            joints=[row("q", 7 + j) for j in range(nj)])
        qd0 = dict(
            lin=tuple(row("qd", i) for i in range(3)),
            ang=tuple(row("qd", 3 + i) for i in range(3)),
            joints=[row("qd", 6 + j) for j in range(nj)])
        act = [row("act", j) for j in range(na)]
        ms = ([row("ms", j) for j in range(na)] if pd.use_motor_strength
              else [1.0] * na)
        mass = [row("mass", b) for b in range(nb)]
        com = [tuple(row("com", 3 * b + i) for i in range(3))
               for b in range(nb)]
        fric = jnp.maximum(row("fric"), 0.0)
        h_g = [row("h", g) for g in range(ng)]
        n_g = [tuple(row("nrm", 3 * g + i) for i in range(3))
               for g in range(ng)]
        if with_box:
            bx0 = dict(
                pos=tuple(row("bq", i) for i in range(3)),
                quat=tuple(row("bq", 3 + i) for i in range(4)),
                lin=tuple(row("bqd", i) for i in range(3)),
                ang=tuple(row("bqd", 3 + i) for i in range(3)),
                mass=row("bmass"),
                i_diag=tuple(row("bidiag", i) for i in range(3)))
            bh_c = [row("bh", c) for c in range(8)]
            bn_c = [tuple(row("bn", 3 * c + i) for i in range(3))
                    for c in range(8)]
        else:
            bx0 = None

        # scaled PD targets are substep-invariant
        target = [act[j] * ms[j] * pd.action_scale[j] + pd.default_pos[j]
                  for j in range(na)]

        def pd_tau(q, qd):
            taus = []
            for j in range(nj):
                if j < na:
                    t = (pd.p_gains[j] * (target[j] - q["joints"][j])
                         - pd.d_gains[j] * qd["joints"][j])
                    taus.append(jnp.clip(t, -effort[j], effort[j]))
                else:
                    taus.append(jnp.zeros_like(q["joints"][j]))
            return taus

        def substep(q, qd, tau, bx):
            # ---------------- FK ----------------
            R = [None] * nb
            p = [None] * nb
            v = [None] * nb
            jR = [None] * nb
            jp = [None] * nb
            S = [None] * nb
            R[0] = quat_to_m(q["quat"])
            p[0] = q["pos"]
            v[0] = mtvec(R[0], qd["ang"]) + mtvec(R[0], qd["lin"])
            for i in range(1, nb):
                qi = q["joints"][i - 1]
                if jtype[i] == 0:
                    jR[i] = mmul(tree_rot[i], axis_angle_m(axis[i], qi))
                    jp[i] = tree_pos[i]
                    S[i] = axis[i] + (0.0, 0.0, 0.0)
                else:
                    jR[i] = tree_rot[i]
                    jp[i] = vadd(tree_pos[i],
                                 mvec(tree_rot[i], vscale(axis[i], qi)))
                    S[i] = (0.0, 0.0, 0.0) + axis[i]
                pa = parent[i]
                R[i] = mmul(R[pa], jR[i])
                p[i] = vadd(mvec(R[pa], jp[i]), p[pa])
                wp, up = v[pa][:3], v[pa][3:]
                w_i = mtvec(jR[i], wp)
                u_i = mtvec(jR[i], vadd(up, vcross(wp, jp[i])))
                qdi = qd["joints"][i - 1]
                vi = list(w_i + u_i)
                for kk in range(6):
                    if S[i][kk] != 0.0:
                        vi[kk] = vi[kk] + S[i][kk] * qdi
                v[i] = tuple(vi)

            # ------------- contact (unrolled per geom) -------------
            active = [None] * ng
            gF = [None] * ng
            count_b = [None] * nb
            for g in range(ng):
                b = geom_body[g]
                r_w = mvec(R[b], geom_pos[g])
                gp = vadd(p[b], r_w)
                phi = (gp[2] - h_g[g]) * n_g[g][2] - geom_radius[g]
                active[g] = phi < 0.0
            for b in range(nb):
                if geoms_of_body[b]:
                    c = None
                    for g in geoms_of_body[b]:
                        a = active[g].astype(jnp.float32)
                        c = a if c is None else c + a
                    count_b[b] = jnp.maximum(c, 1.0)
            if bx is not None:
                Rb = quat_to_m(bx["quat"])
                pb = bx["pos"]
                vbl, wb = bx["lin"], bx["ang"]
                m_box = bx["mass"]
                box_F = (0.0, 0.0, 0.0)
                box_N = (0.0, 0.0, 0.0)
            for g in range(ng):
                b = geom_body[g]
                r_w = mvec(R[b], geom_pos[g])
                gp = vadd(p[b], r_w)
                w_w = mvec(R[b], v[b][:3])
                u_w = mvec(R[b], v[b][3:])
                gv = vadd(u_w, vcross(w_w, r_w))
                nrm = n_g[g]
                phi = (gp[2] - h_g[g]) * nrm[2] - geom_radius[g]
                m_share = jnp.minimum(m_solo[g],
                                      m_body_eff[g] / count_b[b])
                vn = vdot(gv, nrm)
                acc_n = (-vn) / dt + jnp.minimum(
                    cp.baumgarte * jnp.maximum(-phi - cp.slop, 0.0) / dt,
                    cp.max_depen_vel) / dt
                fn = jnp.where(active[g],
                               jnp.clip(m_share * acc_n, 0.0, cp.fn_max), 0.0)
                vt = vsub(gv, vscale(nrm, vn))
                vt_norm = jnp.sqrt(vdot(vt, vt) + cp.vel_eps ** 2)
                ft_mag = jnp.minimum(fric * fn, m_share * vt_norm / dt)
                gF[g] = tuple(
                    jnp.where(active[g],
                              fn * nrm[kk] - vt[kk] / vt_norm * ft_mag, 0.0)
                    for kk in range(3))
                if bx is not None:
                    # robot sphere vs box OBB, two-way (fused.py:494-530)
                    d_loc = mtvec(Rb, vsub(gp, pb))
                    cl = tuple(jnp.clip(d_loc[kk], -bhe[kk], bhe[kk])
                               for kk in range(3))
                    delta = vsub(d_loc, cl)
                    dist = jnp.sqrt(vdot(delta, delta) + 1e-12)
                    n_w = mvec(Rb, vscale(delta, 1.0 / dist))
                    phi_b = dist - geom_radius[g]
                    act_b = (phi_b < 0.0) & (dist > 1e-5)
                    cpt = vadd(pb, mvec(Rb, cl))
                    r_box = vsub(cpt, pb)
                    v_cp = vadd(vbl, vcross(wb, r_box))
                    vr = vsub(gv, v_cp)
                    vn_b = vdot(vr, n_w)
                    m_eff = 1.0 / (1.0 / m_share + 1.0 / m_box)
                    acc_b = (-vn_b) / dt + jnp.minimum(
                        cp.baumgarte * jnp.maximum(-phi_b - cp.slop, 0.0)
                        / dt, cp.max_depen_vel) / dt
                    fn_b = jnp.where(
                        act_b, jnp.clip(m_eff * acc_b, 0.0, cp.fn_max), 0.0)
                    vt_b = vsub(vr, vscale(n_w, vn_b))
                    vtn_b = jnp.sqrt(vdot(vt_b, vt_b) + cp.vel_eps ** 2)
                    ft_b = jnp.minimum(fric * fn_b, m_eff * vtn_b / dt)
                    F_g = tuple(jnp.where(
                        act_b, fn_b * n_w[kk] - vt_b[kk] / vtn_b * ft_b, 0.0)
                        for kk in range(3))
                    gF[g] = vadd(gF[g], F_g)
                    box_F = vsub(box_F, F_g)
                    box_N = vsub(box_N, vcross(r_box, F_g))

            if bx is not None:
                # box corners vs terrain (fused.py:532-557), unrolled;
                # shared mass divides by the active-corner count
                cnt_c = None
                for c in range(8):
                    rc = mvec(Rb, box_corners[c])
                    cw = vadd(pb, rc)
                    a = ((cw[2] - bh_c[c]) * bn_c[c][2] - box_r
                         < 0.0).astype(jnp.float32)
                    cnt_c = a if cnt_c is None else cnt_c + a
                cnt_c = jnp.maximum(cnt_c, 1.0)
                m_sh = m_box / cnt_c
                for c in range(8):
                    rc = mvec(Rb, box_corners[c])
                    cw = vadd(pb, rc)
                    vc = vadd(vbl, vcross(wb, rc))
                    nrm_c = bn_c[c]
                    phi_c = (cw[2] - bh_c[c]) * nrm_c[2] - box_r
                    act_c = phi_c < 0.0
                    vn_c = vdot(vc, nrm_c)
                    acc_c = (-vn_c) / dt + jnp.minimum(
                        cp.baumgarte * jnp.maximum(-phi_c - cp.slop, 0.0)
                        / dt, cp.max_depen_vel) / dt
                    fn_c = jnp.where(
                        act_c, jnp.clip(m_sh * acc_c, 0.0, cp.fn_max), 0.0)
                    vt_c = vsub(vc, vscale(nrm_c, vn_c))
                    vtn_c = jnp.sqrt(vdot(vt_c, vt_c) + cp.vel_eps ** 2)
                    ft_c = jnp.minimum(fric * fn_c, m_sh * vtn_c / dt)
                    F_c = tuple(jnp.where(
                        act_c, fn_c * nrm_c[kk] - vt_c[kk] / vtn_c * ft_c,
                        0.0) for kk in range(3))
                    box_F = vadd(box_F, F_c)
                    box_N = vadd(box_N, vcross(rc, F_c))

            f_ext = [None] * nb
            for b in range(nb):
                if geoms_of_body[b]:
                    F = (0.0, 0.0, 0.0)
                    Nq = (0.0, 0.0, 0.0)
                    for g in geoms_of_body[b]:
                        r_w = mvec(R[b], geom_pos[g])
                        F = vadd(F, gF[g])
                        Nq = vadd(Nq, vcross(r_w, gF[g]))
                    f_ext[b] = (Nq, F)

            # ------------- joint-space extra torques -------------
            tau_eff = list(tau)
            for j in range(nj):
                qj = q["joints"][j]
                qdj = qd["joints"][j]
                below = jnp.minimum(qj - dof_lo[j], 0.0)
                above = jnp.maximum(qj - dof_hi[j], 0.0)
                t = -params.limit_kp * (below + above) * i_eff[j]
                stop = i_eff[j] * jnp.abs(qdj) / dt
                mag = damping[j] * jnp.abs(qdj) + friction_j[j]
                mag = mag + jnp.where((below < 0) | (above > 0),
                                      params.limit_kd * jnp.abs(qdj), 0.0)
                t = t - jnp.sign(qdj) * jnp.minimum(mag, stop)
                tau_eff[j] = tau_eff[j] + t

            # ------------- ABA -------------
            def spatial_I(b):
                m_ = mass[b]
                c = com[b]
                Ic = inert_const[b]
                cx = ((0.0 * m_, -c[2], c[1]),
                      (c[2], 0.0 * m_, -c[0]),
                      (-c[1], c[0], 0.0 * m_))
                Io = [[Ic[i][j] + m_ * sum(cx[i][kk] * cx[j][kk]
                                           for kk in range(3))
                       for j in range(3)] for i in range(3)]
                M6 = [[0.0] * 6 for _ in range(6)]
                for i in range(3):
                    for j in range(3):
                        M6[i][j] = Io[i][j]
                        M6[i][3 + j] = m_ * cx[i][j]
                        M6[3 + i][j] = -m_ * cx[i][j]
                    M6[3 + i][3 + i] = m_
                return tuple(tuple(rw) for rw in M6)

            # lazy IA/pA: spatial inertia + bias force built right when the
            # backward pass consumes body i, keeping the VMEM live-set to
            # the ancestor accumulations instead of all nb 6x6 matrices
            IA = [None] * nb
            pA = [None] * nb
            c_vp = [None] * nb

            def bias_terms(i):
                g_b = mtvec(R[i], gvec)
                fg_lin = vscale(g_b, mass[i])
                fg_ang = vcross(com[i], fg_lin)
                f_bias = fg_ang + fg_lin
                if f_ext[i] is not None:
                    n_b = mtvec(R[i], f_ext[i][0])
                    f_b = mtvec(R[i], f_ext[i][1])
                    f_bias = vadd(f_bias[:3], n_b) + vadd(f_bias[3:], f_b)
                Iv = m6vec(IA[i], v[i])
                vxIv = cross_force6(v[i], Iv)
                return tuple(vxIv[kk] - f_bias[kk] for kk in range(6))

            for i in range(nb):
                if i == 0:
                    c_vp[i] = (0.0,) * 6
                else:
                    qdi = qd["joints"][i - 1]
                    vJ = tuple(S[i][kk] * qdi for kk in range(6))
                    c_vp[i] = cross_motion6(v[i], vJ)

            U = [None] * nb
            d_inv = [None] * nb
            u_ = [None] * nb
            for i in range(nb - 1, 0, -1):
                pa = parent[i]
                if IA[i] is None:
                    IA[i] = spatial_I(i)
                    pA[i] = bias_terms(i)
                if IA[pa] is None:
                    IA[pa] = spatial_I(pa)
                    pA[pa] = bias_terms(pa)
                Ui = m6vec(IA[i], S[i])
                di = sum(S[i][kk] * Ui[kk] for kk in range(6)) + armature[i - 1]
                ui = tau_eff[i - 1] - sum(S[i][kk] * pA[i][kk]
                                          for kk in range(6))
                U[i] = Ui
                d_inv[i] = 1.0 / di
                u_[i] = ui
                Ia = m6add(IA[i], outer6(Ui, Ui, -d_inv[i]))
                Iac = m6vec(Ia, c_vp[i])
                pai = tuple(pA[i][kk] + Iac[kk] + Ui[kk] * (ui * d_inv[i])
                            for kk in range(6))
                Rj, pj = jR[i], jp[i]
                fw, fu = pai[:3], pai[3:]
                Rfu = mvec(Rj, fu)
                fp_ang = vadd(mvec(Rj, fw), vcross(pj, Rfu))
                pA[pa] = tuple(pA[pa][kk] + (fp_ang + Rfu)[kk]
                               for kk in range(6))
                IA[pa] = m6add(IA[pa], transform_abi(Ia, Rj, pj))

            a0 = ldl_solve6(IA[0], tuple(-pA[0][kk] for kk in range(6)))
            a = [a0]
            qdd_j = [None] * nj
            for i in range(1, nb):
                pa = parent[i]
                Rj, pj = jR[i], jp[i]
                ap = a[pa]
                aw = mtvec(Rj, ap[:3])
                au = mtvec(Rj, vadd(ap[3:], vcross(ap[:3], pj)))
                a_in = tuple((aw + au)[kk] + c_vp[i][kk] for kk in range(6))
                qdd = (u_[i] - sum(U[i][kk] * a_in[kk]
                                   for kk in range(6))) * d_inv[i]
                qdd_j[i - 1] = qdd
                a.append(tuple(a_in[kk] + S[i][kk] * qdd for kk in range(6)))

            R0 = R[0]
            w_b, u_b2 = v[0][:3], v[0][3:]
            ang_acc_w = mvec(R0, a0[:3])
            lin_acc_w = mvec(R0, vadd(a0[3:], vcross(w_b, u_b2)))

            # ------------- integrate -------------
            mv_c = params.max_base_vel
            lin = tuple(jnp.clip(x_, -mv_c, mv_c)
                        for x_ in vadd(qd["lin"], vscale(lin_acc_w, dt)))
            ang = tuple(jnp.clip(x_, -mv_c, mv_c)
                        for x_ in vadd(qd["ang"], vscale(ang_acc_w, dt)))
            joints_v = [jnp.clip(qd["joints"][j] + dt * qdd_j[j],
                                 -params.max_joint_vel, params.max_joint_vel)
                        for j in range(nj)]
            pos = vadd(q["pos"], vscale(lin, dt))
            qx, qy, qz, qw = q["quat"]
            ox, oy, oz = ang
            dqx = 0.5 * dt * (qw * ox + oy * qz - oz * qy)
            dqy = 0.5 * dt * (qw * oy - ox * qz + oz * qx)
            dqz = 0.5 * dt * (qw * oz + ox * qy - oy * qx)
            dqw = 0.5 * dt * (-ox * qx - oy * qy - oz * qz)
            nx, ny, nzq, nw = qx + dqx, qy + dqy, qz + dqz, qw + dqw
            inv = jax.lax.rsqrt(nx * nx + ny * ny + nzq * nzq
                                + nw * nw + 1e-12)
            quat = (nx * inv, ny * inv, nzq * inv, nw * inv)
            joints = [q["joints"][j] + dt * joints_v[j] for j in range(nj)]

            bx_new = bx
            if bx is not None:
                # Newton-Euler box integration (fused.py:708-726)
                i_d = bx["i_diag"]
                RbI = tuple(tuple(Rb[i][j] * i_d[j] for j in range(3))
                            for i in range(3))
                I_w = mmul_t(RbI, Rb)
                gyro = vcross(wb, mvec(I_w, wb))
                wd = solve3(I_w, vsub(box_N, gyro))
                lin_acc = vadd(gvec, vscale(box_F, 1.0 / m_box))
                b_lin = tuple(jnp.clip(v_, -mv_c, mv_c)
                              for v_ in vadd(vbl, vscale(lin_acc, dt)))
                b_ang = tuple(jnp.clip(v_, -mv_c, mv_c)
                              for v_ in vadd(wb, vscale(wd, dt)))
                bx_new = dict(
                    pos=vadd(pb, vscale(b_lin, dt)),
                    quat=integrate_quat(bx["quat"], b_ang, dt),
                    lin=b_lin, ang=b_ang, mass=m_box, i_diag=i_d)

            return (dict(pos=pos, quat=quat, joints=joints),
                    dict(lin=lin, ang=ang, joints=joints_v), gF, tau, bx_new)

        # substep loop: python unroll (n_substeps is 4; fori_loop carry of
        # hundreds of tiles trips Mosaic's loop-carried layout assignment)
        q, qd, bx = q0, qd0, bx0
        gF = tau_last = None
        for _ in range(n_substeps):
            tau = pd_tau(q, qd)
            q, qd, gF, tau_last, bx = substep(q, qd, tau, bx)

        def wout(name, i, val):
            y_ref[po[name] + i, 0] = val

        for i in range(3):
            wout("q", i, q["pos"][i])
        for i in range(4):
            wout("q", 3 + i, q["quat"][i])
        for j in range(nj):
            wout("q", 7 + j, q["joints"][j])
        for i in range(3):
            wout("qd", i, qd["lin"][i])
            wout("qd", 3 + i, qd["ang"][i])
        for j in range(nj):
            wout("qd", 6 + j, qd["joints"][j])
        for j in range(nj):
            wout("tau", j, tau_last[j])
        for fi, g in enumerate(foot_geoms):
            for i in range(3):
                wout("foot", 3 * fi + i, gF[g][i])
        for b in range(nb):
            if geoms_of_body[b]:
                F = (0.0, 0.0, 0.0)
                for g in geoms_of_body[b]:
                    F = vadd(F, gF[g])
                for i in range(3):
                    wout("bodyf", 3 * b + i, F[i] + 0.0 * q["pos"][0])
            else:
                for i in range(3):
                    wout("bodyf", 3 * b + i, 0.0 * q["pos"][0])
        if with_box:
            for i in range(3):
                wout("bq", i, bx["pos"][i])
            for i in range(4):
                wout("bq", 3 + i, bx["quat"][i])
            for i in range(3):
                wout("bqd", i, bx["lin"][i])
                wout("bqd", 3 + i, bx["ang"][i])

    @functools.partial(jax.jit, static_argnames=())
    def step(q, qd, actions, motor_strength, mass, com, friction,
             terrain_h, terrain_n, box_q=None, box_qd=None, box_mass=None,
             box_i_diag=None, box_h=None, box_n=None):
        """All inputs (N, ...); N padded to a multiple of 1024 by edge
        replication. terrain_h (N, ng), terrain_n (N, ng, 3) come from the
        per-policy-step terrain cache; box_h (N, 8), box_n (N, 8, 3) from
        sample_box_terrain_cache."""
        N = q.shape[0]
        Np = _round_up(N, TILE_N)
        T = Np // TILE_N

        def pack_rows(*arrs):
            flat = jnp.concatenate(
                [a.reshape(N, -1) for a in arrs], axis=-1)     # (N, K_IN)
            if Np != N:
                flat = jnp.concatenate(
                    [flat, jnp.broadcast_to(flat[:1], (Np - N,) + flat.shape[1:])],
                    axis=0)
            # (N, K) -> (K, T, 8, 128)
            return flat.T.reshape(K_IN, T, TILE[0], TILE[1])

        ms_in = ((motor_strength,) if pd.use_motor_strength else ())
        box_in = ((box_q, box_qd, box_mass.reshape(N, 1),
                   box_i_diag, box_h, box_n.reshape(N, -1))
                  if with_box else ())
        x = pack_rows(q, qd, actions, *ms_in, mass, com.reshape(N, -1),
                      friction.reshape(N, 1), terrain_h,
                      terrain_n.reshape(N, -1), *box_in)

        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((K_OUT, T, TILE[0], TILE[1]),
                                           jnp.float32),
            grid=(T,),
            in_specs=[pl.BlockSpec((K_IN, 1, TILE[0], TILE[1]),
                                   lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((K_OUT, 1, TILE[0], TILE[1]),
                                   lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x)

        flat = y.reshape(K_OUT, Np).T[:N]                       # (N, K_OUT)
        q_out = flat[:, po["q"]:po["q"] + nq]
        qd_out = flat[:, po["qd"]:po["qd"] + nv]
        tau = flat[:, po["tau"]:po["tau"] + nj]
        foot = flat[:, po["foot"]:po["foot"] + 3 * nf].reshape(N, nf, 3)
        bodyf = flat[:, po["bodyf"]:po["bodyf"] + 3 * nb].reshape(N, nb, 3)
        if with_box:
            bq_out = flat[:, po["bq"]:po["bq"] + 7]
            bqd_out = flat[:, po["bqd"]:po["bqd"] + 6]
            return q_out, qd_out, foot, tau, bodyf, bq_out, bqd_out
        return q_out, qd_out, foot, tau, bodyf

    return step


def _default_inertia_const(model: RobotModel):
    from ..sim import dynamics

    return np.asarray(dynamics.default_inertial(model).inertia)


def sample_box_terrain_cache(hf: Heightfield, box_q: jax.Array,
                             box_half_extents):
    """Terrain heights+normals under the box's 8 corners — (N, 8) and
    (N, 8, 3), once per policy step (matches fused.sample_box_terrain)."""
    from ..core import maths

    bhe = tuple(float(h) for h in box_half_extents)
    box_r = 0.5 * min(bhe)
    corners = jnp.asarray(
        [[sx * (bhe[0] - box_r), sy * (bhe[1] - box_r), sz * (bhe[2] - box_r)]
         for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)],
        jnp.float32)                                   # (8, 3)
    cw = (box_q[:, None, 0:3]
          + maths.quat_rotate(box_q[:, None, 3:7], corners[None]))
    h, n = hf.sample_with_normal(cw[..., 0], cw[..., 1])
    n_arr = jnp.stack(list(n), axis=-1)                # (N, 8, 3)
    return h, n_arr


def sample_terrain_cache(model: RobotModel, hf: Heightfield, q: jax.Array):
    """Per-geom terrain heights+normals from positions-only FK — the XLA
    side of the per-policy-step terrain cache (matches fused.py's
    sample_terrain, vectorized over envs with stacked arrays)."""
    from ..sim import dynamics

    def single(qi):
        kin = dynamics.fk(model, qi, jnp.zeros(model.nv))
        gb = jnp.asarray(model.geom_body)
        offs = jnp.asarray(model.geom_pos)
        p = kin.pos[gb] + jnp.einsum("gij,gj->gi", kin.rot[gb], offs)
        return p

    p = jax.vmap(single)(q)                     # (N, ng, 3)
    h, n = hf.sample_with_normal(p[..., 0], p[..., 1])
    n_arr = jnp.stack(list(n), axis=-1)         # (N, ng, 3)
    return h, n_arr
