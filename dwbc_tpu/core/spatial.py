"""6D spatial-vector algebra (Featherstone convention) in pure jnp.

Motion vectors are [angular(3); linear(3)], force vectors [torque(3);
force(3)]. Frames are represented by (R, p): R is the 3x3 rotation taking
local coordinates to the parent/world frame, p the frame origin in the
parent/world frame. This is the foundation of the batched articulated
dynamics in dwbc_tpu.sim.dynamics, which replaces the reference's external
PhysX binary (see SURVEY.md §2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def skew(v: jax.Array) -> jax.Array:
    """Cross-product matrix: skew(v) @ u == cross(v, u)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# spatial transforms as explicit 6x6 matrices
#
# X transforms a motion vector from frame B to frame A where (R, p) is the
# pose of B expressed in A:  v_A = X_motion(R, p) @ v_B


def x_motion(R: jax.Array, p: jax.Array) -> jax.Array:
    """Motion transform B->A for pose (R, p) of B in A."""
    z = jnp.zeros(R.shape[:-2] + (3, 3), dtype=R.dtype)
    top = jnp.concatenate([R, z], axis=-1)
    bot = jnp.concatenate([skew(p) @ R, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def x_force(R: jax.Array, p: jax.Array) -> jax.Array:
    """Force transform B->A: f_A = x_force(R, p) @ f_B."""
    z = jnp.zeros(R.shape[:-2] + (3, 3), dtype=R.dtype)
    top = jnp.concatenate([R, skew(p) @ R], axis=-1)
    bot = jnp.concatenate([z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def x_motion_inv(R: jax.Array, p: jax.Array) -> jax.Array:
    """Motion transform A->B for pose (R, p) of B in A."""
    Rt = jnp.swapaxes(R, -1, -2)
    z = jnp.zeros(R.shape[:-2] + (3, 3), dtype=R.dtype)
    top = jnp.concatenate([Rt, z], axis=-1)
    bot = jnp.concatenate([-Rt @ skew(p), Rt], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def x_force_inv(R: jax.Array, p: jax.Array) -> jax.Array:
    """Force transform A->B for pose (R, p) of B in A."""
    Rt = jnp.swapaxes(R, -1, -2)
    z = jnp.zeros(R.shape[:-2] + (3, 3), dtype=R.dtype)
    top = jnp.concatenate([Rt, -Rt @ skew(p)], axis=-1)
    bot = jnp.concatenate([z, Rt], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


# ---------------------------------------------------------------------------
# cross products


def cross_motion(v: jax.Array, m: jax.Array) -> jax.Array:
    """Spatial motion cross product v x m."""
    w, u = v[..., :3], v[..., 3:]
    mw, mu = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, mu) + jnp.cross(u, mw)], axis=-1
    )


def cross_force(v: jax.Array, f: jax.Array) -> jax.Array:
    """Spatial force cross product v x* f."""
    w, u = v[..., :3], v[..., 3:]
    fw, fu = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, fw) + jnp.cross(u, fu), jnp.cross(w, fu)], axis=-1
    )


# ---------------------------------------------------------------------------
# spatial inertia


def spatial_inertia(mass: jax.Array, com: jax.Array, inertia_com: jax.Array) -> jax.Array:
    """6x6 spatial inertia about the body frame origin.

    mass: scalar, com: (3,) origin->com, inertia_com: (3,3) about the com.
    """
    c = skew(com)
    I = inertia_com + mass * (c @ jnp.swapaxes(c, -1, -2))
    top = jnp.concatenate([I, mass * c], axis=-1)
    bot = jnp.concatenate([-mass * c, mass * jnp.eye(3, dtype=I.dtype) * jnp.ones_like(c)], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
