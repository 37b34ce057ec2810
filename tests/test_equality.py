"""Equality-constraint + coupled-solver tests (reference:
test_equality_connect_constraint_with_sim_step.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.core.host_math import np_transform_inverse, np_transform_point
from newton_tpu.math import transform_point
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.solvers import SolverCoupled, SolverFeatherstone, SolverKamino, SolverVBD, SolverXPBD


def linkage():
    b = nt.ModelBuilder()
    l1 = b.add_body(xform=[0.5, 0, 0, 0, 0, 0, 1])
    b.add_shape_capsule(l1, radius=0.05, half_height=0.25)
    b.add_joint_revolute(parent=-1, child=l1, axis="Y",
                         xform_c=[-0.5, 0, 0, 0, 0, 0, 1])
    l2 = b.add_body(xform=[0.5, 0.4, 0, 0, 0, 0, 1])
    b.add_shape_capsule(l2, radius=0.05, half_height=0.25)
    b.add_joint_revolute(parent=-1, child=l2, axis="Y",
                         xform_p=[0, 0.4, 0, 0, 0, 0, 1],
                         xform_c=[-0.5, 0, 0, 0, 0, 0, 1])
    b.add_equality_constraint(nt.EqType.CONNECT, body1=l1, body2=l2,
                              anchor=(0.5, 0, 0))
    return b


def run(model, solver, frames=60):
    s = eval_fk(model, model.joint_q0, model.joint_qd0, model.state())
    ctrl = model.control()

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, ctrl, None, 1 / 240.), None
        return jax.lax.scan(sub, s, None, length=4)[0]

    for _ in range(frames):
        s = frame(s)
    return s


def connect_drift(model, s):
    bq0 = np.array([[0.5, 0, 0, 0, 0, 0, 1], [0.5, 0.4, 0, 0, 0, 0, 1]])
    a1 = np.array([0.5, 0, 0.0])
    pw0 = np_transform_point(bq0[0], a1)
    a2 = np_transform_point(np_transform_inverse(bq0[1]), pw0)
    p1 = transform_point(s.body_q[0], jnp.asarray(a1, dtype=jnp.float32))
    p2 = transform_point(s.body_q[1], jnp.asarray(a2, dtype=jnp.float32))
    return float(jnp.linalg.norm(p1 - p2))


def test_connect_parallel_linkage():
    m = linkage().finalize()
    s = run(m, SolverFeatherstone(m))
    assert connect_drift(m, s) < 5e-3
    assert abs(float(s.joint_q[0] - s.joint_q[1])) < 1e-3
    assert abs(float(s.joint_q[0])) > 0.5  # actually swung


def test_kamino_linkage():
    m = linkage().finalize()
    s = run(m, SolverKamino(m))
    assert connect_drift(m, s) < 5e-3


def test_mimic_constraint():
    b = nt.ModelBuilder()
    l1 = b.add_body(xform=[0.5, 0, 0, 0, 0, 0, 1])
    b.add_shape_capsule(l1, radius=0.05, half_height=0.25)
    j1 = b.add_joint_revolute(parent=-1, child=l1, axis="Y",
                              xform_c=[-0.5, 0, 0, 0, 0, 0, 1])
    l2 = b.add_body(xform=[0.5, 1.0, 0, 0, 0, 0, 1])
    b.add_shape_capsule(l2, radius=0.05, half_height=0.25)
    j2 = b.add_joint_revolute(parent=-1, child=l2, axis="Y",
                              xform_p=[0, 1.0, 0, 0, 0, 0, 1],
                              xform_c=[-0.5, 0, 0, 0, 0, 0, 1])
    b.add_constraint_mimic(j1, j2, multiplier=1.0)
    m = b.finalize()
    s = run(m, SolverFeatherstone(m))
    q = np.asarray(s.joint_q)
    assert np.isfinite(q).all()
    assert abs(q[0] - q[1]) < 2e-2


def test_coupled_rigid_particle_stable():
    from newton_tpu.sim.collide import CollisionPipeline
    b = nt.ModelBuilder()
    body = b.add_body(xform=[0.25, 0.25, 0.5, 0, 0, 0, 1])
    b.add_shape_sphere(body, radius=0.2)
    b.add_joint_free(body)
    b.add_ground_plane()
    b.add_cloth_grid(pos=(0, 0, 1.0), dim_x=6, dim_y=6, cell_x=0.1,
                     cell_y=0.1, mass=1.0, fix_top=False, tri_ke=500.0)
    m = b.finalize()
    pipe = CollisionPipeline(m)
    solver = SolverCoupled(m, rigid_solver=SolverXPBD(m, iterations=2),
                           particle_solver=SolverVBD(m, iterations=2))
    s = m.state()
    ctrl = m.control()

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, ctrl, pipe.collide(s), 1 / 240.), None
        return jax.lax.scan(sub, s, None, length=4)[0]

    for _ in range(60):
        s = frame(s)
    assert np.isfinite(np.asarray(s.particle_q)).all()
    assert np.isfinite(np.asarray(s.body_q)).all()
    assert abs(float(s.body_q[0, 2]) - 0.2) < 0.05
