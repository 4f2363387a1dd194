"""Speed-of-light batched physics: structure-of-arrays, fully fused.

The vmap-over-structs formulation (sim/dynamics.py) materializes arrays
with tiny trailing dims — (N, nb, 3, 3) pads to (8, 128) TPU tiles, a
~20x HBM blowup that made contact+ABA memory-bound (measured 72 ms per
substep at 4096 envs). This module is the TPU-native re-expression of the
SAME math:

  * every physical scalar is an (N,) array (env axis = lane axis);
  * vectors/matrices are Python tuples of such arrays — all 3x3 and 6x6
    algebra unrolls at trace time into elementwise VPU ops that XLA fuses
    into a handful of kernels; nothing rank-4 ever hits HBM;
  * the kinematic tree loops unroll over the STATIC body list;
  * per-body contact-force accumulation is a static Python sum over each
    body's geom list (no scatter);
  * the 6x6 base solve is an unrolled LDL^T factorization.

Numerical behavior matches sim/dynamics.py (tested to ~1e-4); that module
remains the readable golden reference and provides the cold-path
utilities (CRBA, jacobians, OSC)."""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.model import RobotModel
from ..terrain.terrain import Heightfield
from . import contact as contact_mod
from .contact import ContactParams
from .engine import PhysCtx, SimParams

# ---------------------------------------------------------------------------
# scalarized linear algebra (tuples of (N,) arrays)

Vec3 = Tuple[jax.Array, jax.Array, jax.Array]


def v3(x=0.0, y=0.0, z=0.0):
    return (x, y, z)


def vadd(a, b):
    return tuple(x + y for x, y in zip(a, b))


def vsub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def vscale(a, s):
    return tuple(x * s for x in a)


def vdot(a, b):
    return sum(x * y for x, y in zip(a, b))


def vcross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def mrow(m, i):
    return m[i]


def mvec(m, v):
    """3x3 (tuple of row-tuples) @ vec3."""
    return tuple(vdot(m[i], v) for i in range(3))


def mtvec(m, v):
    """m^T @ v."""
    return tuple(m[0][i] * v[0] + m[1][i] * v[1] + m[2][i] * v[2]
                 for i in range(3))


def mmul(a, b):
    return tuple(tuple(sum(a[i][k] * b[k][j] for k in range(3))
                       for j in range(3)) for i in range(3))


def quat_to_m(q):
    """xyzw quat components -> 3x3 row-tuple matrix."""
    x, y, z, w = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return ((1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
            (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
            (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)))


def axis_angle_m(axis, q):
    """Rotation about a CONSTANT axis (python floats) by per-env angle q."""
    c, s = jnp.cos(q), jnp.sin(q)
    x, y, z = axis
    C = 1 - c
    return ((c + x * x * C, x * y * C - z * s, x * z * C + y * s),
            (y * x * C + z * s, c + y * y * C, y * z * C - x * s),
            (z * x * C - y * s, z * y * C + x * s, c + z * z * C))


# 6-vectors: (ang Vec3, lin Vec3); 6x6 matrices: nested 6-tuples of (N,)


def s6(ang, lin):
    return ang + lin  # 6-tuple


def cross_motion6(v, m):
    w, u = v[:3], v[3:]
    mw, mu = m[:3], m[3:]
    return vcross(w, mw) + vadd(vcross(w, mu), vcross(u, mw))


def cross_force6(v, f):
    w, u = v[:3], v[3:]
    fw, fu = f[:3], f[3:]
    return vadd(vcross(w, fw), vcross(u, fu)) + vcross(w, fu)


def m6vec(M, v):
    return tuple(sum(M[i][j] * v[j] for j in range(6)) for i in range(6))


def m6add(A, B):
    return tuple(tuple(A[i][j] + B[i][j] for j in range(6)) for i in range(6))


def outer6(a, b, scale):
    return tuple(tuple(a[i] * b[j] * scale for j in range(6)) for i in range(6))


def mmul_t(a, b):
    """a @ b^T for 3x3 row-tuples."""
    return tuple(tuple(sum(a[i][k] * b[j][k] for k in range(3))
                       for j in range(3)) for i in range(3))


def skew_mul(p, M):
    """skew(p) @ M  (p a Vec3, M 3x3): rows are p x M_row-space."""
    return (tuple(p[1] * M[2][j] - p[2] * M[1][j] for j in range(3)),
            tuple(p[2] * M[0][j] - p[0] * M[2][j] for j in range(3)),
            tuple(p[0] * M[1][j] - p[1] * M[0][j] for j in range(3)))


def mul_skew(M, p):
    """M @ skew(p): columns are M @ (p x e_j)."""
    # skew(p) columns: col0 = (0, p2, -p1), col1 = (-p2, 0, p0), col2 = (p1, -p0, 0)
    return tuple((
        M[i][1] * p[2] - M[i][2] * p[1],
        -M[i][0] * p[2] + M[i][2] * p[0],
        M[i][0] * p[1] - M[i][1] * p[0],
    ) for i in range(3))


def m3add(A, B):
    return tuple(tuple(A[i][j] + B[i][j] for j in range(3)) for i in range(3))


def m3sub(A, B):
    return tuple(tuple(A[i][j] - B[i][j] for j in range(3)) for i in range(3))


def m3t(A):
    return tuple(tuple(A[j][i] for j in range(3)) for i in range(3))


def transform_abi(Ia, Rj, pj):
    """Parent-frame articulated-body inertia X_f Ia X_m for joint frame
    (Rj, pj) — Featherstone's block formula instead of the 6-basis-column
    congruence (RBDA §2.9 style): with Ia = [[A, B], [B^T, D]],

      D' = R D R^T
      B' = R B R^T + skew(p) D'
      A' = R A R^T + skew(p) (R B^T R^T) - (R B R^T) skew(p)
           - skew(p) D' skew(p)

    ~2.5x fewer flops than the column method — this is the hot block of
    the whole physics step (runs per body per substep)."""
    A = tuple(tuple(Ia[i][j] for j in range(3)) for i in range(3))
    B = tuple(tuple(Ia[i][3 + j] for j in range(3)) for i in range(3))
    D = tuple(tuple(Ia[3 + i][3 + j] for j in range(3)) for i in range(3))
    RA = mmul(Rj, A)
    RB = mmul(Rj, B)
    RD = mmul(Rj, D)
    Ar = mmul_t(RA, Rj)          # R A R^T
    Br = mmul_t(RB, Rj)          # R B R^T
    Dr = mmul_t(RD, Rj)          # R D R^T
    pBrT = skew_mul(pj, m3t(Br))  # skew(p) (R B^T R^T) = skew(p) Br^T
    Brp = mul_skew(Br, pj)       # Br skew(p)
    pDr = skew_mul(pj, Dr)
    pDrp = mul_skew(pDr, pj)
    Atl = m3sub(m3add(Ar, pBrT), m3add(Brp, pDrp))
    Btr = m3add(Br, pDr)
    out = [[None] * 6 for _ in range(6)]
    for i in range(3):
        for j in range(3):
            out[i][j] = Atl[i][j]
            out[i][3 + j] = Btr[i][j]
            out[3 + i][j] = Btr[j][i]
            out[3 + i][3 + j] = Dr[i][j]
    return tuple(tuple(r) for r in out)


def solve3(M, b):
    """Solve M x = b for a 3x3 (row-tuples of (N,)) via the adjugate —
    used for the box world-inertia solve (SPD, well-conditioned)."""
    a, bm, c = M[0]
    d, e, f = M[1]
    g, h, i = M[2]
    A = e * i - f * h
    B = c * h - bm * i
    C = bm * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = bm * g - a * h
    I = a * e - bm * d
    det = a * A + bm * D + c * G
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    return ((A * b[0] + B * b[1] + C * b[2]) * inv,
            (D * b[0] + E * b[1] + F * b[2]) * inv,
            (G * b[0] + H * b[1] + I * b[2]) * inv)


def integrate_quat(quat, ang, dt):
    """Semi-implicit quaternion update q += 0.5 dt (omega ⊗ q), renorm.
    quat = xyzw 4-tuple, ang = world angular velocity Vec3."""
    qx, qy, qz, qw = quat
    ox, oy, oz = ang
    dqx = 0.5 * dt * (qw * ox + oy * qz - oz * qy)
    dqy = 0.5 * dt * (qw * oy - ox * qz + oz * qx)
    dqz = 0.5 * dt * (qw * oz + ox * qy - oy * qx)
    dqw = 0.5 * dt * (-ox * qx - oy * qy - oz * qz)
    nx, ny, nzq, nw = qx + dqx, qy + dqy, qz + dqz, qw + dqw
    inv = jax.lax.rsqrt(nx * nx + ny * ny + nzq * nzq + nw * nw + 1e-12)
    return (nx * inv, ny * inv, nzq * inv, nw * inv)


def ldl_solve6(M, b):
    """Solve M x = b for symmetric positive-definite 6x6 via unrolled
    LDL^T (no pivoting; articulated inertias are SPD). The pivot floor is
    1e-6: a pivot that small means a numerically singular articulated
    inertia (pathological DR draw / deep limit violation) where bounding
    the acceleration beats "accurate" 1e12-scale garbage."""
    # Cholesky: L lower, M = L L^T
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = M[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-6))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L y = b
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return tuple(x)


# ---------------------------------------------------------------------------


class FusedOut(NamedTuple):
    q: jax.Array            # (N, nq)
    qd: jax.Array           # (N, nv)
    foot_forces: jax.Array  # (N, n_feet, 3) world forces on foot geoms
    body_forces: jax.Array  # (N, nb, 3) net contact force per body
    torques: jax.Array      # (N, nj) torques applied on the last substep
    # warm-start state: accumulated world contact forces, to be fed back
    # as `contact_carry` on the next policy step (dict of (N, ng, 3) /
    # (N, 8, 3) arrays). None when warm starting is disabled.
    contact_carry: Optional[dict] = None


def init_contact_carry(model: RobotModel, num_envs: int,
                       with_box: bool = False) -> dict:
    """Zero warm-start contact state (see make_fused_substep). Envs hold
    this as a pytree leaf, pass it to step(), store the returned
    .contact_carry, and zero it (where-masked) for resetting envs."""
    ng = len(model.geom_body)
    d = {"terr": jnp.zeros((num_envs, ng, 3))}
    if with_box:
        d["boxg"] = jnp.zeros((num_envs, ng, 3))
        d["corner"] = jnp.zeros((num_envs, 8, 3))
    return d


def make_fused_substep(model: RobotModel, params: SimParams, hf: Heightfield,
                       ctx: PhysCtx, foot_geoms: np.ndarray,
                       n_substeps: int = 1,
                       box_half_extents: Optional[Tuple[float, ...]] = None):
    """Build step(q, qd, tau_fn, inert, friction) running `n_substeps`
    fused physics substeps. tau_fn(q, qd) -> (N, nj) joint torques is
    re-evaluated each substep (the reference's per-substep PD,
    widowGo1.py:1175-1191).

    With `box_half_extents`, a free box body (the reference's per-env box
    actor, widowGo1.py:320-325/378-392 — simulated by PhysX alongside the
    robot) is co-simulated inside the same substep: robot collision
    spheres contact the box OBB two-way (reaction wrench on the box),
    the box's 8 rounded corners contact the terrain, and the box
    integrates as a single Newton-Euler rigid body. step() then takes
    box_q (N, 7), box_qd (N, 6), box_mass (N,), box_i_diag (N, 3) and
    returns them updated."""

    nb = model.nb
    nj = model.nj
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
    geom_body = [int(b) for b in model.geom_body]
    geom_pos = [tuple(float(v) for v in model.geom_pos[i])
                for i in range(len(geom_body))]
    geom_radius = [float(r) for r in model.geom_radius]
    geoms_of_body = [[g for g, b in enumerate(geom_body) if b == i]
                     for i in range(nb)]
    m_solo = [float(v) for v in np.asarray(ctx.m_solo)]
    m_body_eff = [float(v) for v in np.asarray(ctx.m_body)]
    if ctx.w_geom is not None:
        w_np = np.asarray(ctx.w_geom, np.float32)          # (ng, 3, 3)
    else:  # fall back to isotropic vertical Delassus
        w_np = np.zeros((len(m_solo), 3, 3), np.float32)
        for g, ms in enumerate(m_solo):
            w_np[g] = np.eye(3) / max(ms, 1e-9)
    i_eff = [float(v) for v in np.asarray(ctx.dof_i_eff)]
    foot_geoms = [int(g) for g in foot_geoms]
    gvec = params.gravity
    dt = params.dt
    cp: ContactParams = params.contact

    # static geom constants for the shared contact law (contact.
    # fused_terrain_law): (ng, 1) broadcasting columns + the (nb, ng)
    # one-hot geom->body incidence used for active-count reductions and
    # per-body wrench accumulation
    _E_np = np.zeros((nb, len(geom_body)), np.float32)
    for _g, _b in enumerate(geom_body):
        _E_np[_b, _g] = 1.0
    _geom_const = dict(
        radius=jnp.asarray(np.asarray(geom_radius, np.float32))[:, None],
        m_solo=jnp.asarray(np.asarray(m_solo, np.float32))[:, None],
        m_body=jnp.asarray(np.asarray(m_body_eff, np.float32))[:, None],
        W={k: jnp.asarray(w_np[:, i, j])[:, None]
           for k, (i, j) in dict(xx=(0, 0), yy=(1, 1), zz=(2, 2),
                                 xy=(0, 1), xz=(0, 2),
                                 yz=(1, 2)).items()},
        E=jnp.asarray(_E_np))
    # contact-path default (measured, logs/contact_path_bench.json): the
    # Pallas kernel beats the XLA-fused chain by ~1.1% of collect at
    # 8192 envs (0.6581 vs 0.6656 s best-of-5, identical compile cost),
    # reproduced across two exclusive-chip measurement rounds — so it is
    # the default ON TPU per ops/PALLAS_DESIGN.md's bar. CPU (tests,
    # virtual-mesh dryruns) keeps the XLA path: same shared law, and
    # Mosaic interpret mode is test-only. DWBC_PALLAS_CONTACT=1/0
    # forces either way.
    _flag = os.environ.get("DWBC_PALLAS_CONTACT", "auto")
    if _flag == "auto":
        _use_pallas_contact = jax.default_backend() not in ("cpu",)
    else:
        _use_pallas_contact = _flag == "1"

    if box_half_extents is not None:
        bhe = tuple(float(h) for h in box_half_extents)
        # rounded corners, same compilation as core.model.free_body_model
        box_r = 0.5 * min(bhe)
        box_corners = [
            (sx * (bhe[0] - box_r), sy * (bhe[1] - box_r),
             sz * (bhe[2] - box_r))
            for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]

    # terrain sample-point plan: ONE sample per geom-carrying body + an
    # EXACT sample per foot geom; every other geom gets its height from
    # its body sample's tangent plane. XLA's TPU gather costs ~10 ns per
    # index regardless of table size (measured: the 4x84-geom corner
    # gathers were ~70% of the whole 8192-env policy step), so cutting
    # 84 sample points to ~13 is the lever. Feet — the contacts that
    # shape locomotion — stay exact; non-foot geoms (fall/graze contacts)
    # see the local tangent plane, exact on flat ground and within
    # terrain curvature over <=0.3 m body extents on Perlin.
    sample_bodies = sorted(set(geom_body))
    _body_slot = {b: i for i, b in enumerate(sample_bodies)}
    nsb = len(sample_bodies)
    foot_list = [int(g) for g in foot_geoms]
    geom_slot = np.asarray(
        [(nsb + foot_list.index(g)) if g in foot_list else _body_slot[b]
         for g, b in enumerate(geom_body)], np.int32)

    def fk_positions(q):
        """Positions-only FK -> per-body world (R, p)."""
        R = [None] * nb
        p = [None] * nb
        R[0] = quat_to_m(q["quat"])
        p[0] = q["pos"]
        for i in range(1, nb):
            qi = q["joints"][i - 1]
            if jtype[i] == 0:
                Rj = mmul(tree_rot[i], axis_angle_m(axis[i], qi))
                jp_i = tree_pos[i]
            else:
                Rj = tree_rot[i]
                jp_i = vadd(tree_pos[i],
                            mvec(tree_rot[i], vscale(axis[i], qi)))
            pa = parent[i]
            R[i] = mmul(R[pa], Rj)
            p[i] = vadd(mvec(R[pa], jp_i), p[pa])
        return R, p

    def geom_positions(q):
        """Positions-only FK -> world sphere centers (3 x (ng, N))."""
        R, p = fk_positions(q)
        return _geoms_from(R, p)

    def _geoms_from(R, p):
        gb_idx = np.asarray(geom_body)

        def stack_bodies(get):
            return jnp.stack([get(b) for b in range(nb)], 0)[gb_idx]

        Rg = [[stack_bodies(lambda b, i=i, j=j: R[b][i][j] + 0.0 * p[0][0])
               for j in range(3)] for i in range(3)]
        pg = [stack_bodies(lambda b, k=k: p[b][k]) for k in range(3)]
        ng = len(geom_body)
        off = [jnp.asarray(np.asarray([geom_pos[g][k] for g in range(ng)],
                                      np.float32))[:, None] for k in range(3)]
        return vadd(pg, mvec(Rg, off))

    def sample_terrain(q):
        """(h, normal) per geom — the ONLY gathers in the whole pipeline,
        amortized over all substeps of a policy step (the terrain under a
        geom moves <2 mm within 20 ms). Body-plane sampling plan above."""
        R, p = fk_positions(q)
        gp = _geoms_from(R, p)
        f_idx = np.asarray(foot_list, np.int32)
        xs = jnp.concatenate(
            [jnp.stack([p[b][0] for b in sample_bodies], 0), gp[0][f_idx]], 0)
        ys = jnp.concatenate(
            [jnp.stack([p[b][1] for b in sample_bodies], 0), gp[1][f_idx]], 0)
        if hasattr(hf, "sample_with_normal"):
            h_s, n_s = hf.sample_with_normal(xs, ys)
        else:
            h_s = hf.sample(xs, ys)
            n_arr = hf.normal(xs, ys)
            n_s = (n_arr[..., 0], n_arr[..., 1], n_arr[..., 2])
        slot = geom_slot  # constant row gather: contiguous (1, N) slices
        # cache the tangent PLANE (anchor + normal), not a frozen height:
        # each substep evaluates the plane at the CURRENT geom position
        # (see substep), so contact geometry is temporally smooth within
        # and across policy steps — a frozen per-step height/normal jumps
        # discontinuously as feet micro-move on Perlin cells (measured:
        # 1.85 rad/s standing leg jitter and ~6600 raw energy_square per
        # step on rough vs 72 on flat from exactly those jumps).
        nrm = (n_s[0][slot], n_s[1][slot], n_s[2][slot])
        return h_s[slot], nrm, xs[slot], ys[slot]

    def substep(q, qd, tau, mass, com, inertia, terrain_cache, cf, bx=None,
                box_terrain=None):
        """All args component-ized:
        q: dict(pos Vec3, quat 4-tuple, joints list[nj]),
        qd: dict(lin Vec3, ang Vec3, joints list[nj]),
        tau: list[nj] of (N,),
        mass: list[nb] of (N,), com: list[nb] Vec3, inertia: list[nb] 3x3.
        terrain_cache: (h (ng, N), normal 3x(ng, N)) from sample_terrain.
        cf: warm-start dict of accumulated world contact forces from the
        previous substep, components as 3-tuples of (ng, N) / (8, N):
        {"terr": ..., ["boxg": ..., "corner": ...]}. Sequential-impulse
        warm starting (the PhysX-TGS mechanism, legged_robot_config.py:
        190-192): the converged force persists at rest, so static friction
        holds without velocity creep and the normal force needs no
        penetration-proportional Baumgarte term at equilibrium (measured:
        closes a 27 mm settle-height gap vs MuJoCo to <5 mm).
        bx: co-simulated box state dict (pos/quat/lin/ang/mass/i_diag) or
        None; box_terrain: tangent-plane cache under its center.
        Returns updated (q, qd) + contact info + new cf + updated bx."""

        # ---------------- FK ----------------
        R = [None] * nb       # body->world rotations (3x3 tuples)
        p = [None] * nb       # world positions (Vec3)
        v = [None] * nb       # spatial velocity [ang, lin] body coords
        jR = [None] * nb      # joint rot: body frame in parent frame
        jp = [None] * nb      # joint pos in parent frame
        S = [None] * nb       # motion subspace (6-tuple of floats)

        R[0] = quat_to_m(q["quat"])
        p[0] = q["pos"]
        w_b = mtvec(R[0], qd["ang"])
        u_b = mtvec(R[0], qd["lin"])
        v[0] = w_b + u_b

        for i in range(1, nb):
            qi = q["joints"][i - 1]
            if jtype[i] == 0:  # revolute
                Rj = axis_angle_m(axis[i], qi)
                jR[i] = mmul(tree_rot[i], Rj)
                jp[i] = tree_pos[i]
                S[i] = axis[i] + (0.0, 0.0, 0.0)
            else:  # prismatic
                jR[i] = tree_rot[i]
                off = mvec(tree_rot[i], vscale(axis[i], qi))
                jp[i] = vadd(tree_pos[i], off)
                S[i] = (0.0, 0.0, 0.0) + axis[i]
            pa = parent[i]
            R[i] = mmul(R[pa], jR[i])
            p[i] = vadd(mvec(R[pa], jp[i]), p[pa])
            wp, up = v[pa][:3], v[pa][3:]
            w_i = mtvec(jR[i], wp)
            u_i = mtvec(jR[i], vadd(up, vcross(wp, jp[i])))
            qdi = qd["joints"][i - 1]
            vi = list(w_i + u_i)
            for k in range(6):
                if S[i][k] != 0.0:
                    vi[k] = vi[k] + S[i][k] * qdi
            v[i] = tuple(vi)

        # ---------------- contact (vectorized over the geom axis) ----------
        # All per-geom quantities are (ng, N) arrays: ONE heightfield
        # gather per field and ~100 total ops instead of ~12k scalar ones.
        ng = len(geom_body)
        # stacked per-body components gathered to geoms by constant indices
        gb_idx = np.asarray(geom_body)

        def stack_bodies(get):
            return jnp.stack([get(b) for b in range(nb)], 0)[gb_idx]  # (ng, N)

        Rg = [[stack_bodies(lambda b, i=i, j=j: R[b][i][j] * jnp.ones_like(p[0][0]))
               for j in range(3)] for i in range(3)]
        pg = [stack_bodies(lambda b, k=k: p[b][k]) for k in range(3)]
        vg_ang = [stack_bodies(lambda b, k=k: v[b][k]) for k in range(3)]
        vg_lin = [stack_bodies(lambda b, k=k: v[b][3 + k]) for k in range(3)]

        off = [jnp.asarray(np.asarray([geom_pos[g][k] for g in range(ng)],
                                      np.float32))[:, None] for k in range(3)]

        r_w = mvec(Rg, off)                      # (ng, N) world offsets
        gp = vadd(pg, r_w)
        w_w = mvec(Rg, vg_ang)
        u_w = mvec(Rg, vg_lin)
        gv = vadd(u_w, vcross(w_w, r_w))

        # the impulse law itself lives in sim/contact.fused_terrain_law —
        # ONE implementation shared by the XLA-fused path (default) and
        # the Pallas kernel (DWBC_PALLAS_CONTACT=1, ops/contact_pallas.py;
        # carry-growth clamp, directional Delassus masses, warm-start
        # decay — see the law's docstring and the stability comments in
        # ContactParams)
        E = _geom_const["E"]
        radius_c = _geom_const["radius"]
        if _use_pallas_contact:
            from ..ops.contact_pallas import pallas_terrain_contact
            gF, cf_terr, active, share_f = pallas_terrain_contact(
                gp, gv, terrain_cache, cf["terr"], substep.friction,
                _geom_const, cp, dt)
        else:
            gF, cf_terr, active, share_f = contact_mod.fused_terrain_law(
                gp, gv, terrain_cache, cf["terr"], substep.friction,
                _geom_const, cp, dt)
        cf_new = {"terr": cf_terr}

        def m_dir(d):
            """1/(d^T W d) for a unit direction tuple d (components
            broadcastable to (ng, N)) — box-coupling path."""
            W = _geom_const["W"]
            q = (W["xx"] * d[0] * d[0] + W["yy"] * d[1] * d[1]
                 + W["zz"] * d[2] * d[2]
                 + 2.0 * (W["xy"] * d[0] * d[1] + W["xz"] * d[0] * d[2]
                          + W["yz"] * d[1] * d[2]))
            return 1.0 / jnp.maximum(q, 1e-6)

        # ---------------- box coupling (optional) ----------------
        # Robot spheres vs box OBB, two-way: force on the geom enters the
        # same per-geom pipeline (so foot force sensors see box contact,
        # like PhysX's), reaction wrench accumulates on the box.
        if bx is not None:
            Rb = quat_to_m(bx["quat"])
            pb = bx["pos"]
            vbl, wb = bx["lin"], bx["ang"]
            m_box = bx["mass"]

            d_loc = mtvec(Rb, vsub(gp, pb))               # (ng, N)
            cl = tuple(jnp.clip(d_loc[k], -bhe[k], bhe[k]) for k in range(3))
            delta = vsub(d_loc, cl)
            dist = jnp.sqrt(vdot(delta, delta) + 1e-12)
            n_w = mvec(Rb, vscale(delta, 1.0 / dist))     # box -> geom
            phi_b = dist - radius_c
            act_b = (phi_b < 0.0) & (dist > 1e-5)
            cpt = vadd(pb, mvec(Rb, cl))                  # contact point
            r_box = vsub(cpt, pb)
            v_cp = vadd(vbl, vcross(wb, r_box))
            vr = vsub(gv, v_cp)
            vn_b = vdot(vr, n_w)
            m_eff = 1.0 / (1.0 / (share_f * m_dir(n_w)) + 1.0 / m_box)
            push_b = jnp.minimum(
                cp.baumgarte * jnp.maximum(-phi_b - cp.slop, 0.0) / dt,
                cp.max_depen_vel)
            fprev_b = cf["boxg"]
            fnp_b = cp.warm_decay * jnp.maximum(vdot(fprev_b, n_w), 0.0)
            ftp_b = vscale(vsub(fprev_b, vscale(n_w, vdot(fprev_b, n_w))),
                           cp.warm_decay)
            fn_b = jnp.clip(fnp_b + cp.relax * m_eff * (push_b - vn_b) / dt,
                            0.0, cp.fn_max)
            fn_b = jnp.where(act_b, fn_b, 0.0)
            vt_b = vsub(vr, vscale(n_w, vn_b))
            vtn_bh = jnp.sqrt(vdot(vt_b, vt_b) + 1e-12)
            tb_hat = tuple(vt_b[k] / vtn_bh for k in range(3))
            m_eff_t = 1.0 / (1.0 / (share_f * m_dir(tb_hat)) + 1.0 / m_box)
            ftv_b = vadd(ftp_b, vscale(vt_b, -cp.relax * m_eff_t / dt))
            ftn_b = jnp.sqrt(vdot(ftv_b, ftv_b) + 1e-12)
            fsc_b = jnp.minimum(1.0, substep.friction * fn_b / ftn_b)
            F_geom = tuple(jnp.where(
                act_b, fn_b * n_w[k] + ftv_b[k] * fsc_b, 0.0)
                for k in range(3))
            dF_b = cp.warm_growth * 9.81 * m_eff
            fn_bc = jnp.minimum(fn_b, fnp_b + dF_b)
            fsc_bc = jnp.minimum(fsc_b, (substep.friction * fn_bc) / ftn_b)
            cf_new["boxg"] = tuple(
                jnp.where(act_b, fn_bc * n_w[k] + ftv_b[k] * fsc_bc, 0.0)
                for k in range(3))
            gF = vadd(gF, F_geom)
            box_F = tuple(-jnp.sum(F_geom[k], axis=0) for k in range(3))
            tau_cp = vcross(r_box, F_geom)
            box_N = tuple(-jnp.sum(tau_cp[k], axis=0) for k in range(3))

            # box corners vs terrain (same contact law, shared mass)
            ck = [jnp.asarray(np.asarray([c[k] for c in box_corners],
                                         np.float32))[:, None]
                  for k in range(3)]                      # (8, 1)
            rc = mvec(Rb, ck)                             # (8, N)
            cw = vadd(pb, rc)
            vc = vadd(vbl, vcross(wb, rc))
            hb_a, n_c, bax, bay = box_terrain
            # clamp the extrapolated tangent slope: near discontinuities
            # (arena wall, stairs) n_z -> 0 and dh/dx blows up, which would
            # teleport corner heights by the whole discontinuity across the
            # 0.1 m box diagonal (ADVICE r3). |slope| <= 2 covers every
            # Perlin cell; steeper implies a cliff where extrapolation is
            # meaningless anyway.
            sx = jnp.clip(n_c[0] / n_c[2], -2.0, 2.0)
            sy = jnp.clip(n_c[1] / n_c[2], -2.0, 2.0)
            h_c = hb_a - sx * (cw[0] - bax) - sy * (cw[1] - bay)
            phi_c = (cw[2] - h_c) * n_c[2] - box_r
            act_c = phi_c < 0.0
            cnt_c = jnp.maximum(jnp.sum(act_c.astype(jnp.float32), 0), 1.0)
            m_sh = m_box / cnt_c
            vn_c = vdot(vc, n_c)
            push_c = jnp.minimum(
                cp.baumgarte * jnp.maximum(-phi_c - cp.slop, 0.0) / dt,
                cp.max_depen_vel)
            fprev_c = cf["corner"]
            fnp_c = cp.warm_decay * jnp.maximum(vdot(fprev_c, n_c), 0.0)
            ftp_c = vscale(vsub(fprev_c, vscale(n_c, vdot(fprev_c, n_c))),
                           cp.warm_decay)
            fn_cc = jnp.clip(fnp_c + cp.relax * m_sh * (push_c - vn_c) / dt,
                             0.0, cp.fn_max)
            fn_cc = jnp.where(act_c, fn_cc, 0.0)
            vt_c = vsub(vc, vscale(n_c, vn_c))
            ftv_c = vadd(ftp_c, vscale(vt_c, -cp.relax * m_sh / dt))
            ftn_c = jnp.sqrt(vdot(ftv_c, ftv_c) + 1e-12)
            fsc_c = jnp.minimum(1.0, substep.friction * fn_cc / ftn_c)
            F_c = tuple(jnp.where(
                act_c, fn_cc * n_c[k] + ftv_c[k] * fsc_c, 0.0)
                for k in range(3))
            dF_c = cp.warm_growth * 9.81 * m_sh
            fn_ck = jnp.minimum(fn_cc, fnp_c + dF_c)
            fsc_ck = jnp.minimum(fsc_c, (substep.friction * fn_ck) / ftn_c)
            cf_new["corner"] = tuple(
                jnp.where(act_c, fn_ck * n_c[k] + ftv_c[k] * fsc_ck, 0.0)
                for k in range(3))
            box_F = vadd(box_F, tuple(jnp.sum(F_c[k], 0) for k in range(3)))
            tau_c = vcross(rc, F_c)
            box_N = vadd(box_N, tuple(jnp.sum(tau_c[k], 0) for k in range(3)))

        torque_g = vcross(r_w, gF)

        # per-body world wrench via one-hot matmul (no scatter)
        bF = tuple(E @ gF[k] for k in range(3))          # (nb, N)
        bN = tuple(E @ torque_g[k] for k in range(3))
        f_ext = [((bN[0][b], bN[1][b], bN[2][b]),
                  (bF[0][b], bF[1][b], bF[2][b]))
                 if geoms_of_body[b] else None for b in range(nb)]
        gf_arr = jnp.stack(gF, -1).transpose(1, 0, 2)  # (N, ng, 3)

        # ---------------- joint-space extra torques ----------------
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

        # ---------------- ABA ----------------
        # spatial inertia about body origin (6x6) per body, from (mass,
        # com, inertia-about-com):  [[I_o, m cx],[-m cx, m 1]]
        def spatial_I(b):
            m_ = mass[b]
            c = com[b]
            Ic = inertia[b]
            cx = ((jnp.zeros_like(m_) if isinstance(m_, jax.Array) else 0.0,
                   -c[2], c[1]),
                  (c[2], 0.0 * m_, -c[0]),
                  (-c[1], c[0], 0.0 * m_))
            # I_o = I_com + m * cx cx^T
            Io = [[Ic[i][j] + m_ * sum(cx[i][k] * cx[j][k] for k in range(3))
                   for j in range(3)] for i in range(3)]
            M6 = [[0.0] * 6 for _ in range(6)]
            for i in range(3):
                for j in range(3):
                    M6[i][j] = Io[i][j]
                    M6[i][3 + j] = m_ * cx[i][j]
                    M6[3 + i][j] = -m_ * cx[i][j]
                M6[3 + i][3 + i] = m_
            return tuple(tuple(row) for row in M6)

        IA = [spatial_I(b) for b in range(nb)]

        # gravity wrench in body coords + external contact wrench
        pA = [None] * nb
        c_vp = [None] * nb
        for i in range(nb):
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
            pA[i] = tuple(vxIv[k] - f_bias[k] for k in range(6))
            if i == 0:
                c_vp[i] = (0.0,) * 6
            else:
                qdi = qd["joints"][i - 1]
                vJ = tuple(S[i][k] * qdi for k in range(6))
                c_vp[i] = cross_motion6(v[i], vJ)

        U = [None] * nb
        d_inv = [None] * nb
        u_ = [None] * nb
        for i in range(nb - 1, 0, -1):
            pa = parent[i]
            Ui = m6vec(IA[i], S[i])
            di = sum(S[i][k] * Ui[k] for k in range(6)) + armature[i - 1]
            ui = tau_eff[i - 1] - sum(S[i][k] * pA[i][k] for k in range(6))
            U[i] = Ui
            d_inv[i] = 1.0 / di
            u_[i] = ui
            # Ia = IA - U U^T / d
            Ia = m6add(IA[i], outer6(Ui, Ui, -d_inv[i]))
            # pa_i = pA + Ia c + U u/d
            Iac = m6vec(Ia, c_vp[i])
            pai = tuple(pA[i][k] + Iac[k] + Ui[k] * (ui * d_inv[i])
                        for k in range(6))
            # transform to parent: X_f = [[Rj, px Rj],[0, Rj]] with (Rj, jp)
            # force vec f_parent = [Rj fw + px Rj fu ; Rj fu]
            Rj, pj = jR[i], jp[i]
            fw, fu = pai[:3], pai[3:]
            Rfu = mvec(Rj, fu)
            fp_ang = vadd(mvec(Rj, fw), vcross(pj, Rfu))
            fp_lin = Rfu
            pA[pa] = tuple(pA[pa][k] + (fp_ang + fp_lin)[k] for k in range(6))
            # IA_parent += X_f Ia X_m (Featherstone block formula)
            IA[pa] = m6add(IA[pa], transform_abi(Ia, Rj, pj))

        a0 = ldl_solve6(IA[0], tuple(-pA[0][k] for k in range(6)))
        a = [a0]
        qdd_j = [None] * nj
        for i in range(1, nb):
            pa = parent[i]
            Rj, pj = jR[i], jp[i]
            ap = a[pa]
            aw = mtvec(Rj, ap[:3])
            au = mtvec(Rj, vadd(ap[3:], vcross(ap[:3], pj)))
            a_in = tuple((aw + au)[k] + c_vp[i][k] for k in range(6))
            qdd = (u_[i] - sum(U[i][k] * a_in[k] for k in range(6))) * d_inv[i]
            qdd_j[i - 1] = qdd
            a.append(tuple(a_in[k] + S[i][k] * qdd for k in range(6)))

        # base accel to world coords
        R0 = R[0]
        w_b, u_b2 = v[0][:3], v[0][3:]
        ang_acc_w = mvec(R0, a0[:3])
        lin_acc_w = mvec(R0, vadd(a0[3:], vcross(w_b, u_b2)))

        # ---------------- integrate (semi-implicit) ----------------
        # base velocity clamps: a near-singular articulated inertia (deep
        # limit violation + extreme DR draw) can spike the base solve; the
        # clamp bounds the damage to one recoverable-or-terminated step
        # instead of an inf->NaN cascade that no termination check catches
        mv = params.max_base_vel
        lin = tuple(jnp.clip(v_, -mv, mv)
                    for v_ in vadd(qd["lin"], vscale(lin_acc_w, dt)))
        ang = tuple(jnp.clip(v_, -mv, mv)
                    for v_ in vadd(qd["ang"], vscale(ang_acc_w, dt)))
        joints_v = [jnp.clip(qd["joints"][j] + dt * qdd_j[j],
                             -params.max_joint_vel, params.max_joint_vel)
                    for j in range(nj)]
        pos = vadd(q["pos"], vscale(lin, dt))
        # quat integration: q += 0.5*dt*(omega ⊗ q), renormalize
        qx, qy, qz, qw = q["quat"]
        ox, oy, oz = ang
        dqx = 0.5 * dt * (qw * ox + oy * qz - oz * qy)
        dqy = 0.5 * dt * (qw * oy - ox * qz + oz * qx)
        dqz = 0.5 * dt * (qw * oz + ox * qy - oy * qx)
        dqw = 0.5 * dt * (-ox * qx - oy * qy - oz * qz)
        nx, ny, nzq, nw = qx + dqx, qy + dqy, qz + dqz, qw + dqw
        inv = jax.lax.rsqrt(nx * nx + ny * ny + nzq * nzq + nw * nw + 1e-12)
        quat = (nx * inv, ny * inv, nzq * inv, nw * inv)
        joints = [q["joints"][j] + dt * joints_v[j] for j in range(nj)]

        q_new = dict(pos=pos, quat=quat, joints=joints)
        qd_new = dict(lin=lin, ang=ang, joints=joints_v)

        # ---------------- box integration (Newton-Euler) ----------------
        bx_new = bx
        if bx is not None:
            i_d = bx["i_diag"]
            # world inertia I_w = Rb diag(i_d) Rb^T
            RbI = tuple(tuple(Rb[i][j] * i_d[j] for j in range(3))
                        for i in range(3))
            I_w = mmul_t(RbI, Rb)
            gyro = vcross(wb, mvec(I_w, wb))
            wd = solve3(I_w, vsub(box_N, gyro))
            lin_acc = vadd(gvec, vscale(box_F, 1.0 / m_box))
            b_lin = tuple(jnp.clip(v_, -mv, mv)
                          for v_ in vadd(vbl, vscale(lin_acc, dt)))
            b_ang = tuple(jnp.clip(v_, -mv, mv)
                          for v_ in vadd(wb, vscale(wd, dt)))
            bx_new = dict(
                pos=vadd(pb, vscale(b_lin, dt)),
                quat=integrate_quat(bx["quat"], b_ang, dt),
                lin=b_lin, ang=b_ang, mass=m_box, i_diag=i_d)

        return q_new, qd_new, gf_arr, cf_new, bx_new

    # box-corner sampling strategy, decided at BUILD time from the
    # terrain itself (ADVICE r3 / VERDICT r4 Weak #7): the substep's
    # tangent-plane slope clamp covers |dh/dxy| <= 2, so one center
    # sample extrapolated to all 8 corners is exact-within-curvature on
    # smooth terrain (Perlin cell deltas ~0.02 m, plane 0) — and per-
    # corner sampling there costs a measured ~2 ms/policy-step of pure
    # gather at 8192 envs (8 corners x 4-gather bilinear). Terrain with
    # cell-to-cell steps beyond the clamp (stairs, step edges: the
    # configs grid terrains produce) gets EXACT per-corner planes, which
    # the center extrapolation misses by the full discontinuity.
    # robust roughness: the max cell delta over PHYSICAL features —
    # deltas >= 50 m are the arena-wall fencing rows (+1e5 m,
    # terrain.py wall trick), unreachable by fenced envs and excluded;
    # any real stair/step edge (0.1-1 m) registers at full height
    _h_np = np.asarray(hf.height, np.float32)
    _cell_step = 0.0
    if _h_np.size > 1:
        _d = np.concatenate([np.abs(np.diff(_h_np, axis=0)).ravel(),
                             np.abs(np.diff(_h_np, axis=1)).ravel()])
        _d = _d[_d < 50.0]
        if _d.size:
            _cell_step = float(_d.max())
    # 0.15 m: below this, the clamped center plane's worst-case corner
    # error stays within the contact softness (widow Perlin max physical
    # delta measured 0.065 -> ~1 mm error at the steepest cell); above
    # it a box face could rest on phantom ground at a step edge
    box_corner_exact = _cell_step > 0.15

    def sample_box_terrain(box_q):
        """Terrain tangent-plane cache under the box corners: (h anchor,
        normal, anchor x, anchor y), evaluated at current corner
        positions inside each substep (same scheme as the robot geoms).
        Per-corner (8, N) samples on discontinuous terrain; one center
        (1, N) sample broadcast over corners on smooth terrain — see
        `box_corner_exact` above."""
        pb = tuple(box_q[:, k] for k in range(3))
        if box_corner_exact:
            Rb = quat_to_m(tuple(box_q[:, 3 + k] for k in range(4)))
            ck = [jnp.asarray(np.asarray([c[k] for c in box_corners],
                                         np.float32))[:, None]
                  for k in range(3)]
            cw = vadd(pb, mvec(Rb, ck))
            cx, cy = cw[0], cw[1]                    # (8, N)
        else:
            cx, cy = pb[0][None, :], pb[1][None, :]  # (1, N)
        if hasattr(hf, "sample_with_normal"):
            h_c, n_c = hf.sample_with_normal(cx, cy)
        else:
            h_c = hf.sample(cx, cy)
            n_arr = hf.normal(cx, cy)
            n_c = (n_arr[..., 0], n_arr[..., 1], n_arr[..., 2])
        return h_c, n_c, cx, cy

    def step(q: jax.Array, qd: jax.Array, tau_fn, mass: jax.Array,
             com: jax.Array, inertia: jax.Array, friction: jax.Array,
             n_steps: int, tau_carry=None, box_q=None, box_qd=None,
             box_mass=None, box_i_diag=None,
             contact_carry=None) -> FusedOut:
        """q: (N, nq), qd: (N, nv); tau_fn(carry, q_arr, qd_arr) ->
        (carry, (N, nj)) — stateful controllers (e.g. the LSTM actuator
        net, reference anymal.py:71-78) thread their state through the
        substep scan via `carry`. mass (N, nb), com (N, nb, 3),
        inertia (N, nb, 3, 3), friction (N,). When the builder got
        box_half_extents, box_q (N, 7), box_qd (N, 6), box_mass (N,),
        box_i_diag (N, 3) must be given; the return gains
        (box_q_new, box_qd_new).

        contact_carry: warm-start dict from init_contact_carry / the
        previous FusedOut.contact_carry; None starts from zero forces
        (cold impact — correct for a fresh spawn, creeps under sustained
        shear if never threaded across policy steps)."""
        # decompose to components
        qc = dict(
            pos=tuple(q[:, k] for k in range(3)),
            quat=tuple(q[:, 3 + k] for k in range(4)),
            joints=[q[:, 7 + j] for j in range(nj)])
        qdc = dict(
            lin=tuple(qd[:, k] for k in range(3)),
            ang=tuple(qd[:, 3 + k] for k in range(3)),
            joints=[qd[:, 6 + j] for j in range(nj)])
        mass_c = [mass[:, b] for b in range(nb)]
        com_c = [tuple(com[:, b, k] for k in range(3)) for b in range(nb)]
        inert_c = [tuple(tuple(inertia[:, b, i, j] for j in range(3))
                         for i in range(3)) for b in range(nb)]
        substep.friction = friction
        terrain_cache = sample_terrain(qc)

        with_box = box_half_extents is not None
        if with_box:
            bx0 = dict(
                pos=tuple(box_q[:, k] for k in range(3)),
                quat=tuple(box_q[:, 3 + k] for k in range(4)),
                lin=tuple(box_qd[:, k] for k in range(3)),
                ang=tuple(box_qd[:, 3 + k] for k in range(3)),
                mass=box_mass,
                i_diag=tuple(box_i_diag[:, k] for k in range(3)))
            box_terrain = sample_box_terrain(box_q)
        else:
            bx0, box_terrain = None, None

        # warm-start carry: (N, rows, 3) arrays -> 3-tuples of (rows, N)
        ng = len(geom_body)
        N_env = q.shape[0]
        if contact_carry is None:
            cf0 = {"terr": tuple(jnp.zeros((ng, N_env)) for _ in range(3))}
            if with_box:
                cf0["boxg"] = tuple(jnp.zeros((ng, N_env)) for _ in range(3))
                cf0["corner"] = tuple(jnp.zeros((8, N_env)) for _ in range(3))
        else:
            cf0 = {k: tuple(v[:, :, c].T for c in range(3))
                   for k, v in contact_carry.items()}

        def scan_body(carry, _):
            qc, qdc, tc, cfc, bxc = carry
            q_arr = jnp.stack(list(qc["pos"]) + list(qc["quat"])
                              + qc["joints"], axis=-1)
            qd_arr = jnp.stack(list(qdc["lin"]) + list(qdc["ang"])
                               + qdc["joints"], axis=-1)
            tc, tau_arr = tau_fn(tc, q_arr, qd_arr)
            tau_c = [tau_arr[:, j] for j in range(nj)]
            qc, qdc, gf, cfc, bxc = substep(qc, qdc, tau_c, mass_c, com_c,
                                            inert_c, terrain_cache, cfc, bxc,
                                            box_terrain)
            return (qc, qdc, tc, cfc, bxc), (gf, tau_arr)

        tc0 = tau_carry if tau_carry is not None else jnp.zeros(())
        # DWBC_UNROLL=k: unroll factor for the substep scan. k>=n_steps
        # straight-lines everything (removes ALL carry staging but the
        # XLA compile of the 4x graph exceeded 25 min on the 2-core CPU
        # host); intermediate k trades carry staging against compile time
        # via lax.scan's native unroll.
        unroll = int(os.environ.get("DWBC_UNROLL", "0") or 0)
        if n_steps > 1 and unroll < n_steps:
            (qc, qdc, tc_out, cf_out, bx_out), (gf_all, tau_all) = jax.lax.scan(
                scan_body, (qc, qdc, tc0, cf0, bx0), None, length=n_steps,
                unroll=max(unroll, 1))
            gf_last, tau_last = gf_all[-1], tau_all[-1]
        else:
            # unrolled: a 4-substep lax.scan stages its (hundreds-of-leaves)
            # carry through scoped memory every iteration — the copy-start
            # traffic was the top cost after the gather fix. Straight-line
            # code lets XLA fuse across substeps instead.
            carry = (qc, qdc, tc0, cf0, bx0)
            for _ in range(n_steps):
                carry, (gf_last, tau_last) = scan_body(carry, None)
            (qc, qdc, tc_out, cf_out, bx_out) = carry
        cf_arrs = {k: jnp.stack([v[0].T, v[1].T, v[2].T], axis=-1)
                   for k, v in cf_out.items()}

        q_out = jnp.stack(list(qc["pos"]) + list(qc["quat"]) + qc["joints"],
                          axis=-1)
        qd_out = jnp.stack(list(qdc["lin"]) + list(qdc["ang"]) + qdc["joints"],
                           axis=-1)
        foot = (gf_last[:, np.asarray(foot_geoms)] if foot_geoms
                else jnp.zeros((q.shape[0], 0, 3)))
        E_np = np.zeros((nb, len(geom_body)), np.float32)
        for g, b in enumerate(geom_body):
            E_np[b, g] = 1.0
        body_forces = jnp.einsum("bg,ngc->nbc", jnp.asarray(E_np), gf_last)
        out = FusedOut(q=q_out, qd=qd_out, foot_forces=foot,
                       body_forces=body_forces, torques=tau_last,
                       contact_carry=cf_arrs)
        if with_box:
            box_q_out = jnp.stack(list(bx_out["pos"])
                                  + list(bx_out["quat"]), axis=-1)
            box_qd_out = jnp.stack(list(bx_out["lin"])
                                   + list(bx_out["ang"]), axis=-1)
            return out, tc_out, box_q_out, box_qd_out
        return out, tc_out

    return step
