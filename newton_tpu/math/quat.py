"""Quaternion algebra on ``(..., 4)`` arrays, xyzw storage.

All functions are shape-polymorphic over leading batch dimensions and are
pure jnp — usable inside jit/vmap/grad and inside Pallas kernels.

Convention matches the reference engine (Warp): quaternions are stored
``[x, y, z, w]`` and rotate column vectors by ``v' = q v q*``.
(reference: newton/_src/core/types.py uses wp.quat = xyzw.)
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "quat_identity",
    "quat_mul",
    "quat_conjugate",
    "quat_inverse",
    "quat_normalize",
    "quat_rotate",
    "quat_rotate_inv",
    "quat_from_axis_angle",
    "quat_to_axis_angle",
    "quat_to_matrix",
    "quat_from_matrix",
    "quat_integrate",
    "quat_from_euler",
    "quat_twist",
    "quat_twist_angle",
    "quat_decompose_swing_twist",
    "quat_exp",
    "quat_log",
    "quat_diff_vel",
]

_EPS = 1e-12


def quat_identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    q = jnp.zeros((*shape, 4), dtype=dtype)
    return q.at[..., 3].set(1.0)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b (apply b's rotation first, then a's)."""
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


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_inverse(q: jnp.ndarray) -> jnp.ndarray:
    return quat_conjugate(q) / jnp.maximum(
        jnp.sum(q * q, axis=-1, keepdims=True), _EPS
    )


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    # double-where keeps gradients finite when ||q|| == 0 (the norm is not
    # differentiable at zero; NaNs would leak through jnp.where otherwise)
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    ok = n2 > 1e-12
    safe = jnp.where(ok, q, quat_identity(q.shape[:-1], q.dtype))
    return safe / jnp.linalg.norm(safe, axis=-1, keepdims=True)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q: v' = q v q*."""
    u = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    u = -q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    angle = jnp.asarray(angle)
    half = 0.5 * angle
    s = jnp.sin(half)
    c = jnp.cos(half)
    return jnp.concatenate([axis * s[..., None], c[..., None]], axis=-1)


def quat_to_axis_angle(q: jnp.ndarray):
    """Return (axis, angle) with angle in [0, pi]. Axis arbitrary at angle 0."""
    q = jnp.where(q[..., 3:4] < 0.0, -q, q)
    s2 = jnp.sum(q[..., :3] * q[..., :3], axis=-1)
    ok = s2 > 1e-12
    safe_v = jnp.where(ok[..., None], q[..., :3],
                       jnp.zeros_like(q[..., :3]).at[..., 0].set(1.0))
    sin_half = jnp.linalg.norm(safe_v, axis=-1)
    angle = jnp.where(ok, 2.0 * jnp.arctan2(sin_half, q[..., 3]), 0.0)
    axis = safe_v / sin_half[..., None]
    return axis, angle


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> 3x3 rotation matrix, shape (..., 3, 3)."""
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
    return m.reshape(*q.shape[:-1], 3, 3)


def quat_from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> quaternion (xyzw), branch-free.

    Uses the max-trace-candidate formulation evaluated on all four branches
    then selects — safe under vmap/jit (no data-dependent control flow).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate 4*|component|^2 values
    qw2 = jnp.maximum(0.0, 1.0 + tr)
    qx2 = jnp.maximum(0.0, 1.0 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1.0 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1.0 - m00 - m11 + m22)

    # branch w
    sw = jnp.sqrt(jnp.maximum(qw2, _EPS)) * 2.0
    qw_w = 0.25 * sw
    qx_w = (m21 - m12) / jnp.maximum(sw, _EPS)
    qy_w = (m02 - m20) / jnp.maximum(sw, _EPS)
    qz_w = (m10 - m01) / jnp.maximum(sw, _EPS)
    # branch x
    sx = jnp.sqrt(jnp.maximum(qx2, _EPS)) * 2.0
    qw_x = (m21 - m12) / jnp.maximum(sx, _EPS)
    qx_x = 0.25 * sx
    qy_x = (m01 + m10) / jnp.maximum(sx, _EPS)
    qz_x = (m02 + m20) / jnp.maximum(sx, _EPS)
    # branch y
    sy = jnp.sqrt(jnp.maximum(qy2, _EPS)) * 2.0
    qw_y = (m02 - m20) / jnp.maximum(sy, _EPS)
    qx_y = (m01 + m10) / jnp.maximum(sy, _EPS)
    qy_y = 0.25 * sy
    qz_y = (m12 + m21) / jnp.maximum(sy, _EPS)
    # branch z
    sz = jnp.sqrt(jnp.maximum(qz2, _EPS)) * 2.0
    qw_z = (m10 - m01) / jnp.maximum(sz, _EPS)
    qx_z = (m02 + m20) / jnp.maximum(sz, _EPS)
    qy_z = (m12 + m21) / jnp.maximum(sz, _EPS)
    qz_z = 0.25 * sz

    cand = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    idx = jnp.argmax(cand, axis=-1)

    qx = jnp.select([idx == 0, idx == 1, idx == 2], [qx_w, qx_x, qx_y], qx_z)
    qy = jnp.select([idx == 0, idx == 1, idx == 2], [qy_w, qy_x, qy_y], qy_z)
    qz = jnp.select([idx == 0, idx == 1, idx == 2], [qz_w, qz_x, qz_y], qz_z)
    qw = jnp.select([idx == 0, idx == 1, idx == 2], [qw_w, qw_x, qw_y], qw_z)
    q = jnp.stack([qx, qy, qz, qw], axis=-1)
    return quat_normalize(q)


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate orientation by world-frame angular velocity, renormalized."""
    dq = quat_mul(
        jnp.concatenate([omega, jnp.zeros_like(omega[..., :1])], axis=-1), q
    )
    return quat_normalize(q + 0.5 * dt * dq)


def quat_from_euler(e: jnp.ndarray, i: int = 0, j: int = 1, k: int = 2) -> jnp.ndarray:
    """Quaternion from Euler angles with given intrinsic axis order (default xyz)."""
    def axis_quat(ax_idx, angle):
        axis = jnp.zeros(e.shape[:-1] + (3,), dtype=e.dtype).at[..., ax_idx].set(1.0)
        return quat_from_axis_angle(axis, angle)

    qi = axis_quat(i, e[..., 0])
    qj = axis_quat(j, e[..., 1])
    qk = axis_quat(k, e[..., 2])
    return quat_mul(qi, quat_mul(qj, qk))


def quat_twist(axis: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Twist component of q about axis (swing-twist decomposition)."""
    a = jnp.sum(q[..., :3] * axis, axis=-1, keepdims=True) * axis
    tw = jnp.concatenate([a, q[..., 3:4]], axis=-1)
    return quat_normalize(tw)


def quat_twist_angle(axis: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    tw = quat_twist(axis, q)
    sin_half = jnp.sum(tw[..., :3] * axis, axis=-1)
    return 2.0 * jnp.arctan2(sin_half, tw[..., 3])


def quat_decompose_swing_twist(axis: jnp.ndarray, q: jnp.ndarray):
    twist = quat_twist(axis, q)
    swing = quat_mul(q, quat_conjugate(twist))
    return swing, twist


def quat_exp(v: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: rotation vector (..., 3) -> quaternion."""
    a2 = jnp.sum(v * v, axis=-1)
    small = a2 < 1e-12
    safe_v = jnp.where(small[..., None], jnp.zeros_like(v).at[..., 0].set(1.0), v)
    angle = jnp.linalg.norm(safe_v, axis=-1)
    q = quat_from_axis_angle(safe_v / angle[..., None], angle)
    q_small = jnp.concatenate([0.5 * v, jnp.ones_like(v[..., :1])], axis=-1)
    return jnp.where(small[..., None], quat_normalize(q_small), q)


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map: quaternion -> rotation vector (..., 3)."""
    axis, angle = quat_to_axis_angle(q)
    return axis * angle[..., None]


def quat_diff_vel(q0: jnp.ndarray, q1: jnp.ndarray, dt) -> jnp.ndarray:
    """World-frame angular velocity taking q0 to q1 over dt."""
    dq = quat_mul(q1, quat_conjugate(q0))
    dq = jnp.where(dq[..., 3:4] < 0.0, -dq, dq)
    return quat_log(dq) / dt
