"""Math-layer unit tests (quat/transform/spatial), mirroring the reference's
test_math coverage (reference: newton/tests/ test files for spatial math)."""

import jax.numpy as jnp
import numpy as np
import pytest

import newton_tpu.math as m


def test_quat_identity_rotate():
    q = m.quat_identity()
    v = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(m.quat_rotate(q, v), v, atol=1e-6)


def test_quat_mul_compose():
    qx = m.quat_from_axis_angle(jnp.array([1.0, 0, 0]), jnp.pi / 2)
    qy = m.quat_from_axis_angle(jnp.array([0.0, 1, 0]), jnp.pi / 2)
    v = jnp.array([0.0, 0.0, 1.0])
    # rotate by qx first then qy
    r1 = m.quat_rotate(qy, m.quat_rotate(qx, v))
    r2 = m.quat_rotate(m.quat_mul(qy, qx), v)
    np.testing.assert_allclose(r1, r2, atol=1e-6)


def test_quat_axis_angle_roundtrip():
    axis = jnp.array([0.26726124, 0.53452248, 0.80178373])
    angle = 1.234
    q = m.quat_from_axis_angle(axis, angle)
    axis2, angle2 = m.quat_to_axis_angle(q)
    np.testing.assert_allclose(axis2, axis, atol=1e-6)
    np.testing.assert_allclose(angle2, angle, atol=1e-6)


def test_quat_matrix_roundtrip():
    q = m.quat_normalize(jnp.array([0.1, -0.4, 0.2, 0.8]))
    R = m.quat_to_matrix(q)
    q2 = m.quat_from_matrix(R)
    # q and -q are the same rotation
    sign = jnp.sign(jnp.sum(q * q2))
    np.testing.assert_allclose(sign * q2, q, atol=1e-5)


def test_transform_multiply_inverse():
    t1 = jnp.array([1.0, 2, 3, *np.asarray(
        m.quat_from_axis_angle(jnp.array([0.0, 0, 1]), 0.7))])
    t2 = jnp.array([-0.5, 0.1, 2.0, *np.asarray(
        m.quat_from_axis_angle(jnp.array([1.0, 0, 0]), -0.3))])
    t12 = m.transform_multiply(t1, t2)
    p = jnp.array([0.3, -0.2, 0.9])
    np.testing.assert_allclose(
        m.transform_point(t12, p),
        m.transform_point(t1, m.transform_point(t2, p)), atol=1e-5)
    tinv = m.transform_inverse(t1)
    np.testing.assert_allclose(
        m.transform_point(tinv, m.transform_point(t1, p)), p, atol=1e-5)


def test_spatial_convention_linear_first():
    # twist [v, w]: velocity at offset r is v + w x r
    twist = jnp.array([1.0, 0, 0, 0, 0, 2.0])  # v=(1,0,0), w=(0,0,2)
    r = jnp.array([0.0, 1.0, 0.0])
    v = m.velocity_at_point(twist, r)
    np.testing.assert_allclose(v, [1.0 - 2.0, 0.0, 0.0], atol=1e-6)


def test_orthonormal_basis():
    for n in ([0.0, 0, 1], [0.0, 0, -1], [0.7, -0.3, 0.648]):
        n = jnp.asarray(n)
        n = n / jnp.linalg.norm(n)
        t1, t2 = m.orthonormal_basis(n)
        for a, b in ((t1, t2), (t1, n), (t2, n)):
            assert abs(float(jnp.dot(a, b))) < 1e-5
        np.testing.assert_allclose(jnp.cross(t1, t2), n, atol=1e-5)


def test_batched_ops():
    qs = m.quat_normalize(jnp.arange(24.0).reshape(6, 4) + 1.0)
    vs = jnp.ones((6, 3))
    out = m.quat_rotate(qs, vs)
    assert out.shape == (6, 3)
    # rotation preserves length
    np.testing.assert_allclose(
        jnp.linalg.norm(out, axis=-1), jnp.linalg.norm(vs, axis=-1), rtol=1e-5)
