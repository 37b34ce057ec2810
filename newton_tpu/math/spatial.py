"""Spatial (6D) vector algebra: twists and wrenches, **linear-first** ``[v, w]``.

Matches the reference's public convention (reference:
docs/concepts/conventions.rst:110-115 — Newton's public ``spatial_vector``
arrays use ``(linear, angular)`` ordering; State.body_qd = [v_com, omega] in
world frame, State.body_f = [f, tau] at COM in world frame). TPU-native
equivalent of newton/_src/math/spatial.py (transform_twist :420,
velocity_at_point :392, smooth min/max, orthonormal basis). Pure jnp over
``(..., 6)`` arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quat import quat_rotate, quat_rotate_inv

__all__ = [
    "spatial_top",
    "spatial_bottom",
    "spatial_vector",
    "spatial_cross",
    "spatial_cross_dual",
    "velocity_at_point",
    "transform_twist",
    "transform_wrench",
    "smooth_min",
    "smooth_max",
    "orthonormal_basis",
    "skew",
]


def spatial_top(s: jnp.ndarray) -> jnp.ndarray:
    """Linear part (first three components, reference convention)."""
    return s[..., 0:3]


def spatial_bottom(s: jnp.ndarray) -> jnp.ndarray:
    """Angular part (last three components)."""
    return s[..., 3:6]


def spatial_vector(v: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Build a spatial vector from linear ``v`` and angular ``w`` parts."""
    return jnp.concatenate([v, w], axis=-1)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix, (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(*v.shape[:-1], 3, 3)


def spatial_cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Motion-cross-motion in [v, w] layout: [w_a x v_b + v_a x w_b, w_a x w_b]."""
    va, wa = a[..., 0:3], a[..., 3:6]
    vb, wb = b[..., 0:3], b[..., 3:6]
    return jnp.concatenate(
        [jnp.cross(wa, vb) + jnp.cross(va, wb), jnp.cross(wa, wb)], axis=-1
    )


def spatial_cross_dual(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Motion-cross-force in [f, tau] layout: [w_a x f_b, w_a x t_b + v_a x f_b]."""
    va, wa = a[..., 0:3], a[..., 3:6]
    fb, tb = b[..., 0:3], b[..., 3:6]
    return jnp.concatenate(
        [jnp.cross(wa, fb), jnp.cross(wa, tb) + jnp.cross(va, fb)], axis=-1
    )


def velocity_at_point(twist: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Linear velocity at a point offset ``r`` from the twist's reference point
    (reference: math/spatial.py:392)."""
    return twist[..., 0:3] + jnp.cross(twist[..., 3:6], r)


def transform_twist(t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Change frame of a twist by transform t (rotation + moment shift)
    (reference: math/spatial.py:420)."""
    q, p = t[..., 3:7], t[..., 0:3]
    w = quat_rotate(q, s[..., 3:6])
    v = quat_rotate(q, s[..., 0:3]) + jnp.cross(p, w)
    return jnp.concatenate([v, w], axis=-1)


def transform_wrench(t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Change frame of a wrench [force, torque] by transform t."""
    q, p = t[..., 3:7], t[..., 0:3]
    f = quat_rotate(q, s[..., 0:3])
    tau = quat_rotate(q, s[..., 3:6]) + jnp.cross(p, f)
    return jnp.concatenate([f, tau], axis=-1)


def smooth_min(a, b, eps=1e-5):
    """C1 smooth minimum (polynomial smooth-min)."""
    h = jnp.maximum(eps - jnp.abs(a - b), 0.0) / eps
    return jnp.minimum(a, b) - h * h * eps * 0.25


def smooth_max(a, b, eps=1e-5):
    return -smooth_min(-a, -b, eps)


def orthonormal_basis(n: jnp.ndarray):
    """Two unit tangents orthogonal to unit normal n (branch-free, Duff et al.).

    Returns (t1, t2) with [n, t1, t2] right-handed.
    """
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t1 = jnp.stack(
        [1.0 + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]], axis=-1
    )
    t2 = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t1, t2


def safe_norm(v, axis=-1, eps=1e-12):
    """Norm with finite gradients at ||v|| = 0 (double-where: the norm's
    subgradient at zero otherwise leaks NaN through jnp.where branches)."""
    n2 = jnp.sum(v * v, axis=axis)
    ok = n2 > eps
    safe = jnp.where(ok, n2, 1.0)
    return jnp.where(ok, jnp.sqrt(safe), 0.0)


def safe_normalize(v, axis=-1, eps=1e-12):
    """Unit vector with finite gradients at ||v|| = 0 (returns 0 there)."""
    n2 = jnp.sum(v * v, axis=axis, keepdims=True)
    ok = n2 > eps
    safe_v = jnp.where(ok, v, 1.0)
    unit = safe_v / jnp.sqrt(jnp.sum(safe_v * safe_v, axis=axis,
                                     keepdims=True))
    return jnp.where(ok, unit, 0.0)
