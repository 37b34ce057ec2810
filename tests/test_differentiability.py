"""Autodiff-through-physics tests: jax.grad flows through FK, collision and
full solver steps (replaces the reference's wp.Tape machinery and its
differentiable-contacts augmentation, geometry/differentiable_contacts.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverFeatherstone, SolverXPBD


def test_grad_through_generalized_step():
    b = nt.ModelBuilder()
    link = b.add_body(xform=[0.5, 0, 0, 0, 0, 0, 1])
    b.add_shape_box(link, hx=0.5, hy=0.05, hz=0.05)
    b.add_joint_revolute(parent=-1, child=link, axis="Y",
                         xform_c=[-0.5, 0, 0, 0, 0, 0, 1], armature=0.0)
    m = b.finalize()
    solver = SolverFeatherstone(m)
    ctrl = m.control()
    s0 = eval_fk(m, jnp.zeros(1), jnp.zeros(1), m.state())

    def loss(tau):
        c = ctrl.replace(joint_f=tau)
        s = s0
        for _ in range(3):
            s = solver.step(s, None, c, None, 1 / 240.)
        return s.joint_qd[0]

    g = jax.grad(loss)(jnp.zeros(1, dtype=jnp.float32))
    # qd/dtau ~ n_steps * dt / M_total
    M = 0.84166664 + 10.0 * 0.25
    expected = 3 * (1 / 240.) / M
    np.testing.assert_allclose(np.asarray(g), [expected], rtol=0.05)


def test_grad_through_contact_step():
    b = nt.ModelBuilder()
    body = b.add_body(xform=[0, 0, 0.45, 0, 0, 0, 1])
    b.add_shape_sphere(body, radius=0.5)
    b.add_joint_free(body)
    b.add_ground_plane()
    m = b.finalize()
    pipe = CollisionPipeline(m)
    solver = SolverXPBD(m, iterations=2)
    ctrl = m.control()

    def loss(z0):
        s = m.state()
        s = s.replace(body_q=s.body_q.at[0, 2].set(z0),
                      joint_q=s.joint_q.at[2].set(z0))
        for _ in range(2):
            s = solver.step(s, None, ctrl, pipe.collide(s), 1 / 240.)
        return s.body_q[0, 2]

    g = jax.grad(loss)(jnp.asarray(0.45, dtype=jnp.float32))
    assert np.isfinite(float(g))
    # matches central finite differences through the contact push-out
    eps = 1e-3
    fd = (loss(jnp.asarray(0.45 + eps)) - loss(jnp.asarray(0.45 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), atol=0.05)


def test_grad_through_tendon_actuation():
    """jax.grad through the fixed-tendon force path matches finite
    differences (asymmetric readout: the tendon drives q1 - q2)."""
    from newton_tpu.sim.articulation import eval_fk
    from newton_tpu.solvers.generalized.solver import SolverFeatherstone

    b = nt.ModelBuilder()
    l1 = b.add_body(xform=[0.5, 0, 1, 0, 0, 0, 1])
    b.add_shape_box(l1, hx=0.4, hy=0.05, hz=0.05)
    b.add_joint_revolute(-1, l1, axis="Y", xform_p=[0, 0, 1, 0, 0, 0, 1],
                         xform_c=[-0.5, 0, 0, 0, 0, 0, 1])
    l2 = b.add_body(xform=[1.5, 0, 1, 0, 0, 0, 1])
    b.add_shape_box(l2, hx=0.4, hy=0.05, hz=0.05)
    b.add_joint_revolute(-1, l2, axis="Y", xform_p=[1, 0, 1, 0, 0, 0, 1],
                         xform_c=[-0.5, 0, 0, 0, 0, 0, 1])
    b.add_tendon_fixed([0, 1], [1.0, -1.0], stiffness=50.0, damping=1.0)
    m = b.finalize()
    solver = SolverFeatherstone(m)
    s0 = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
    ctrl = m.control()

    def loss(tf):
        c = ctrl.replace(tendon_f=tf)

        def sub(s, _):
            return solver.step(s, None, c, None, 1 / 240.), None
        s = jax.lax.scan(sub, s0, None, length=20)[0]
        return s.joint_q[0] - s.joint_q[1]

    g = float(jax.grad(loss)(jnp.zeros(1))[0])
    e = 1e-2
    fd = float((loss(jnp.array([e])) - loss(jnp.array([-e]))) / (2 * e))
    assert np.isfinite(g)
    assert abs(fd - g) / max(abs(fd), 1e-12) < 0.02
