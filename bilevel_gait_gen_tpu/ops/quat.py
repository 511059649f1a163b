"""Quaternion and SO(3) manifold/tangent maps (pure JAX, fully differentiable).

TPU-native replacement for the reference's Pinocchio-backed manifold math
(reference: mpc/models/single_rigid_body_model.cpp:179-220, which wraps
pinocchio::quaternion::log3/exp3).  Quaternions use the (x, y, z, w)
convention to match the reference's Eigen layout.

All functions are shape-polymorphic over leading batch dimensions only via
`jax.vmap`; the core functions operate on single quaternions/vectors so they
can be composed freely inside jitted code.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def normalize(q: jax.Array) -> jax.Array:
    """Normalize a quaternion [x, y, z, w]."""
    return q / jnp.linalg.norm(q)


def multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 * q2, both [x, y, z, w]."""
    x1, y1, z1, w1 = q1[0], q1[1], q1[2], q1[3]
    x2, y2, z2, w2 = q2[0], q2[1], q2[2], q2[3]
    return jnp.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ])


def conjugate(q: jax.Array) -> jax.Array:
    return jnp.stack([-q[0], -q[1], -q[2], q[3]])


def identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by quaternion q (active rotation, R(q) @ v)."""
    u = q[:3]
    w = q[3]
    # v' = v + 2 w (u x v) + 2 u x (u x v)
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def to_matrix(q: jax.Array) -> jax.Array:
    """Rotation matrix R(q), 3x3."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.array([
        [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
    ])


def log3(q: jax.Array) -> jax.Array:
    """SO(3) log map: quaternion -> rotation vector (tangent), smooth at 0.

    Matches pinocchio::quaternion::log3 semantics (angle-axis vector).  Uses a
    Taylor expansion of theta/sin(theta/2) near identity so that `jax.grad`
    is exact and finite there.
    """
    q = q * jnp.sign(q[3] + _EPS)  # take the short arc (w >= 0)
    v = q[:3]
    w = jnp.clip(q[3], -1.0, 1.0)
    s2 = jnp.dot(v, v)
    small = s2 < 1e-8
    # guard the sqrt so d(sqrt)/d(s2) never sees 0 (where-NaN trap)
    safe_s = jnp.sqrt(jnp.where(small, 1.0, s2))
    theta = 2.0 * jnp.arctan2(safe_s, w)
    # theta/s with series for small s: 2/w * (1 - s^2/(3 w^2) + ...)
    w_safe = jnp.maximum(w, 0.5)  # only used in the small branch where w ~ 1
    series = 2.0 / w_safe * (1.0 - s2 / (3.0 * w_safe * w_safe))
    factor = jnp.where(small, series, theta / safe_s)
    return factor * v


def exp3(omega: jax.Array) -> jax.Array:
    """SO(3) exp map: rotation vector -> quaternion [x, y, z, w], smooth at 0."""
    theta2 = jnp.dot(omega, omega)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    half = 0.5 * theta
    small = theta < 1e-4
    # sin(half)/theta with series 1/2 - theta^2/48 + ...
    sinc_half = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([sinc_half * omega, jnp.array([w], dtype=omega.dtype)])


def box_minus(q: jax.Array, q_ref: jax.Array) -> jax.Array:
    """Tangent-space difference log3(q_ref^{-1} * q).

    The reference uses the identity quaternion as q_ref in production
    (single_rigid_body_model.cpp:183 hardcodes quat_ref = Identity), so the
    default call sites pass identity, but the general form is kept.
    """
    return log3(multiply(conjugate(q_ref), q))


def box_plus(q_ref: jax.Array, omega: jax.Array) -> jax.Array:
    """Tangent-space retraction q_ref * exp3(omega)."""
    return normalize(multiply(q_ref, exp3(omega)))


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric cross-product matrix [v]_x with [v]_x @ u = v x u."""
    z = jnp.zeros((), dtype=v.dtype)
    return jnp.array([
        [z, -v[2], v[1]],
        [v[2], z, -v[0]],
        [-v[1], v[0], z],
    ])


def from_euler_zyx(rpy: jax.Array) -> jax.Array:
    """Quaternion from roll-pitch-yaw (XYZ intrinsic / ZYX extrinsic)."""
    r, p, y = rpy[0] * 0.5, rpy[1] * 0.5, rpy[2] * 0.5
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack([
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
        cr * cp * cy + sr * sp * sy,
    ])


def yaw(q: jax.Array) -> jax.Array:
    """Yaw angle of the rotation (rotation of body x-axis about world z)."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
