"""Rigid transforms on ``(..., 7)`` arrays: ``[px, py, pz, qx, qy, qz, qw]``.

TPU-native equivalent of the reference's wp.transform usage
(reference: newton/_src/math/spatial.py, core/types.py). Pure jnp, batched.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quat import (
    quat_conjugate,
    quat_identity,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_rotate_inv,
)

__all__ = [
    "transform_identity",
    "transform",
    "transform_p",
    "transform_q",
    "transform_multiply",
    "transform_inverse",
    "transform_point",
    "transform_vector",
    "transform_point_inv",
    "transform_vector_inv",
    "transform_normalize",
]


def transform_identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    t = jnp.zeros((*shape, 7), dtype=dtype)
    return t.at[..., 6].set(1.0)


def transform(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([p, q], axis=-1)


def transform_p(t: jnp.ndarray) -> jnp.ndarray:
    return t[..., 0:3]


def transform_q(t: jnp.ndarray) -> jnp.ndarray:
    return t[..., 3:7]


def transform_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose transforms: (a*b) maps a point first by b, then by a."""
    p = a[..., 0:3] + quat_rotate(a[..., 3:7], b[..., 0:3])
    q = quat_mul(a[..., 3:7], b[..., 3:7])
    return jnp.concatenate([p, q], axis=-1)


def transform_inverse(t: jnp.ndarray) -> jnp.ndarray:
    qi = quat_conjugate(t[..., 3:7])
    p = -quat_rotate(qi, t[..., 0:3])
    return jnp.concatenate([p, qi], axis=-1)


def transform_point(t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return t[..., 0:3] + quat_rotate(t[..., 3:7], x)


def transform_vector(t: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(t[..., 3:7], v)


def transform_point_inv(t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate_inv(t[..., 3:7], x - t[..., 0:3])


def transform_vector_inv(t: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate_inv(t[..., 3:7], v)


def transform_normalize(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([t[..., 0:3], quat_normalize(t[..., 3:7])], axis=-1)
