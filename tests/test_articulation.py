"""FK/IK tests against analytic expectations (reference: tests exercising
eval_fk/eval_ik; pendulum envelope from examples/basic/example_basic_pendulum.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk, eval_ik


def pendulum_model():
    b = nt.ModelBuilder()
    link = b.add_body(xform=[0.5, 0, 0, 0, 0, 0, 1])
    b.add_shape_box(link, hx=0.5, hy=0.05, hz=0.05)
    b.add_joint_revolute(parent=-1, child=link, axis="Y",
                         xform_c=[-0.5, 0, 0, 0, 0, 0, 1])
    return b.finalize()


def test_fk_pendulum_analytic():
    m = pendulum_model()
    s = m.state()
    q = jnp.array([np.pi / 2], dtype=jnp.float32)
    qd = jnp.array([1.0], dtype=jnp.float32)
    s2 = eval_fk(m, q, qd, s)
    # rotation of +90deg about Y maps +X to -Z: body origin at (0, 0, -0.5)
    np.testing.assert_allclose(np.asarray(s2.body_q)[0, :3], [0, 0, -0.5],
                               atol=1e-5)
    # twist: w = (0,1,0); v_com = w x r = (-0.5, 0, 0)
    np.testing.assert_allclose(np.asarray(s2.body_qd)[0],
                               [-0.5, 0, 0, 0, 1, 0], atol=1e-5)


def test_fk_ik_roundtrip_chain():
    b = nt.ModelBuilder()
    root = b.add_body(xform=[0, 0, 1, 0, 0, 0, 1])
    b.add_shape_sphere(root, radius=0.1)
    b.add_joint_free(root)
    mid = b.add_body(xform=[0.5, 0, 1, 0, 0, 0, 1])
    b.add_shape_sphere(mid, radius=0.1)
    b.add_joint_revolute(parent=root, child=mid, axis="Z",
                         xform_p=[0.25, 0, 0, 0, 0, 0, 1],
                         xform_c=[-0.25, 0, 0, 0, 0, 0, 1])
    tip = b.add_body(xform=[1.0, 0, 1, 0, 0, 0, 1])
    b.add_shape_sphere(tip, radius=0.1)
    b.add_joint_prismatic(parent=mid, child=tip, axis="X",
                          xform_p=[0.25, 0, 0, 0, 0, 0, 1],
                          xform_c=[-0.25, 0, 0, 0, 0, 0, 1])
    m = b.finalize()

    q = jnp.array([0.1, -0.2, 1.3, 0, 0, 0, 1, 0.6, 0.15], dtype=jnp.float32)
    qd = jnp.array([0.1, 0.2, -0.1, 0.0, 0.0, 0.5, 0.7, 0.3], dtype=jnp.float32)
    s = eval_fk(m, q, qd, m.state())
    q2, qd2 = eval_ik(m, s)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-4)
    np.testing.assert_allclose(np.asarray(qd2), np.asarray(qd), atol=1e-4)


def test_fk_ball_joint():
    b = nt.ModelBuilder()
    link = b.add_body(xform=[0, 0, -0.5, 0, 0, 0, 1])
    b.add_shape_sphere(link, radius=0.1)
    b.add_joint_ball(parent=-1, child=link, xform_c=[0, 0, 0.5, 0, 0, 0, 1])
    m = b.finalize()
    import newton_tpu.math as nm
    rot = nm.quat_from_axis_angle(jnp.array([1.0, 0, 0]), jnp.pi / 2)
    q = jnp.asarray(rot, dtype=jnp.float32)
    qd = jnp.array([0.0, 0.0, 0.0], dtype=jnp.float32)
    s = eval_fk(m, q, qd, m.state())
    # link hangs along -Z; rotating +90 about X sends -Z to +Y... check:
    # R_x(90): (0,0,-1) -> (0, 1, 0)
    np.testing.assert_allclose(np.asarray(s.body_q)[0, :3], [0, 1 * 0.5, 0],
                               atol=1e-5)


def test_fk_masked_articulations():
    b = nt.ModelBuilder()
    sub = nt.ModelBuilder()
    link = sub.add_body(xform=[0.5, 0, 0, 0, 0, 0, 1])
    sub.add_shape_box(link, hx=0.5, hy=0.05, hz=0.05)
    sub.add_joint_revolute(parent=-1, child=link, axis="Y",
                           xform_c=[-0.5, 0, 0, 0, 0, 0, 1])
    b.replicate(sub, 3)
    m = b.finalize()
    s0 = m.state()
    q = jnp.array([np.pi / 2, np.pi / 2, np.pi / 2], dtype=jnp.float32)
    qd = jnp.zeros(3, dtype=jnp.float32)
    mask = jnp.array([True, False, True])
    s1 = eval_fk(m, q, qd, s0, mask=mask)
    bq = np.asarray(s1.body_q)
    np.testing.assert_allclose(bq[0, :3], [0, 0, -0.5], atol=1e-5)
    np.testing.assert_allclose(bq[1, :3], [0.5, 0, 0], atol=1e-5)  # unchanged
    np.testing.assert_allclose(bq[2, :3], [0, 0, -0.5], atol=1e-5)


def test_fk_jit_and_grad():
    m = pendulum_model()
    s = m.state()

    @jax.jit
    def tip_height(q):
        s2 = eval_fk(m, q, jnp.zeros(1, dtype=jnp.float32), s)
        return s2.body_q[0, 2]

    g = jax.grad(tip_height)(jnp.array([0.3], dtype=jnp.float32))
    # z(q) = -0.5 sin(q) (about Y, x->-z); dz/dq = -0.5 cos(q)
    np.testing.assert_allclose(np.asarray(g), [-0.5 * np.cos(0.3)], atol=1e-4)


def test_fk_d6_two_angular():
    from newton_tpu.sim import JointDofConfig
    b = nt.ModelBuilder()
    link = b.add_body()
    b.add_shape_sphere(link, radius=0.1)
    b.add_joint_d6(parent=-1, child=link,
                   angular_axes=[JointDofConfig(axis="X"),
                                 JointDofConfig(axis="Y")])
    m = b.finalize()
    q = jnp.array([0.4, 0.0], dtype=jnp.float32)
    qd = jnp.zeros(2, dtype=jnp.float32)
    s = eval_fk(m, q, qd, m.state())
    import newton_tpu.math as nm
    expected = nm.quat_from_axis_angle(jnp.array([1.0, 0, 0]), 0.4)
    np.testing.assert_allclose(np.asarray(s.body_q)[0, 3:7],
                               np.asarray(expected), atol=1e-5)
