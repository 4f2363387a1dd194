"""Quaternion / rotation / spherical-coordinate math (pure jnp).

Replaces the external-and-patched `isaacgym.torch_utils` functions the
reference leans on (quat_rotate_inverse, quat_apply, euler_from_quat,
quat_from_euler_xyz, torch_wrap_to_pi_minuspi, cart2sphere, sphere2cart,
orientation_error — see reference widowGo1.py:535-537, 882-884, 1102,
1219-1233, 1313, 1331-1347), written from scratch for JAX.

Conventions:
  * quaternions are (x, y, z, w) — matching the reference's state layout
    (root_states[:, 3:7], init rot [0,0,0,1]) and URDF semantics;
  * euler angles are extrinsic XYZ (roll, pitch, yaw);
  * spherical coordinates are (l, pitch, yaw) with
    x = l cos(p) cos(y), y = l cos(p) sin(y), z = l sin(p).

All functions broadcast over arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# basics


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-9) -> jax.Array:
    return v / (jnp.linalg.norm(v, axis=axis, keepdims=True) + eps)


def wrap_to_pi(x: jax.Array) -> jax.Array:
    """Wrap angles to (-pi, pi]."""
    return x - 2.0 * jnp.pi * jnp.round(x / (2.0 * jnp.pi))


# ---------------------------------------------------------------------------
# quaternion algebra (xyzw)


def quat_identity(shape=()) -> jax.Array:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 3].set(1.0)


def quat_conjugate(q: jax.Array) -> jax.Array:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, xyzw layout."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by quaternion q (body->world if q is body orientation)."""
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def quat_rotate_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by q^{-1} (world->body)."""
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v - w * t + jnp.cross(xyz, t)


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1
    )


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Rotation matrix R such that R @ v == quat_rotate(q, v)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix -> xyzw quaternion (branch-free, Shepperd-style)."""
    # Use the w>=0 hemisphere; numerically safe variant via four candidates.
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    qw = jnp.sqrt(jnp.maximum(0.0, 1 + tr)) / 2
    qx = jnp.sqrt(jnp.maximum(0.0, 1 + m00 - m11 - m22)) / 2
    qy = jnp.sqrt(jnp.maximum(0.0, 1 - m00 + m11 - m22)) / 2
    qz = jnp.sqrt(jnp.maximum(0.0, 1 - m00 - m11 + m22)) / 2
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    q = jnp.stack([qx, qy, qz, qw], axis=-1)
    return normalize(q)


def quat_from_euler_xyz(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def euler_from_quat(q: jax.Array):
    """Extrinsic XYZ (roll, pitch, yaw) from xyzw quaternion."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (w * x + y * z)
    cosr_cosp = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return roll, pitch, yaw


def yaw_quat(q: jax.Array) -> jax.Array:
    """Quaternion keeping only the yaw component of q."""
    _, _, yaw = euler_from_quat(q)
    z = jnp.zeros_like(yaw)
    return quat_from_euler_xyz(z, z, yaw)


def quat_apply_yaw(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by only the yaw of q (reference legged_gym utils/math.py:38-42)."""
    return quat_rotate(yaw_quat(q), v)


def quat_integrate(q: jax.Array, omega_world: jax.Array, dt) -> jax.Array:
    """Integrate orientation with world-frame angular velocity."""
    dq = quat_mul(
        jnp.concatenate([omega_world, jnp.zeros_like(omega_world[..., :1])], axis=-1),
        q,
    )
    return normalize(q + 0.5 * dt * dq)


def orientation_error(desired: jax.Array, current: jax.Array) -> jax.Array:
    """Axis-angle-ish orientation error used by the OSC expert
    (reference widowGo1.py:1223)."""
    cc = quat_conjugate(current)
    q_r = quat_mul(desired, cc)
    return q_r[..., :3] * jnp.sign(q_r[..., 3:4])


# ---------------------------------------------------------------------------
# spherical coords (l, pitch, yaw)


def sphere2cart(s: jax.Array) -> jax.Array:
    l, p, y = s[..., 0], s[..., 1], s[..., 2]
    cp = jnp.cos(p)
    return jnp.stack([l * cp * jnp.cos(y), l * cp * jnp.sin(y), l * jnp.sin(p)], axis=-1)


def cart2sphere(c: jax.Array) -> jax.Array:
    l = jnp.linalg.norm(c, axis=-1)
    safe_l = jnp.maximum(l, 1e-9)
    p = jnp.arcsin(jnp.clip(c[..., 2] / safe_l, -1.0, 1.0))
    y = jnp.arctan2(c[..., 1], c[..., 0])
    return jnp.stack([l, p, y], axis=-1)


# ---------------------------------------------------------------------------
# rng helpers (keyed equivalents of torch_rand_* in isaacgym.torch_utils)


def uniform(key, shape, lo, hi, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype=dtype, minval=lo, maxval=hi)


def rand_sign(key, shape):
    return jnp.where(jax.random.bernoulli(key, 0.5, shape), 1.0, -1.0)


def rand_sqrt_uniform(key, shape, lo, hi):
    """sqrt-shaped distribution in [lo, hi]
    (reference legged_gym utils/math.py:51-56)."""
    r = jax.random.uniform(key, shape, minval=-1.0, maxval=1.0)
    r = jnp.where(r < 0, -jnp.sqrt(-r), jnp.sqrt(r))
    return (r + 1.0) / 2.0 * (hi - lo) + lo


# ---------------------------------------------------------------------------
# small-matrix linear algebra (unrolled; jnp.linalg LU/SVD loop on TPU)


def solve_spd(A, b):
    """Solve A x = b for a small SPD matrix via trace-time-unrolled
    Cholesky (n is static, e.g. 6 for the OSC task-space inertia).
    jnp.linalg.solve's batched LU runs as a device loop on TPU and cost
    ~80 ms per 4096-env call in the r4 adaptive-variant profile; this
    unrolls to pure elementwise ops that XLA fuses. b may be (n,) or
    (n, k)."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)
