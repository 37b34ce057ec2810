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


def test_four_bar_loop_closure_kamino():
    """Four-bar linkage: crank + rocker grounded, coupler closes the loop
    via CONNECT (reference: kamino kinematic-loop scenes). The loop must
    stay closed through a gravity swing."""
    b = nt.ModelBuilder()
    crank = b.add_body(xform=[0.0, 0, 0.5, 0, 0, 0, 1])
    b.add_shape_capsule(crank, radius=0.04, half_height=0.25)
    b.add_joint_revolute(parent=-1, child=crank, axis="Y",
                         xform_c=[0, 0, -0.5, 0, 0, 0, 1])
    rocker = b.add_body(xform=[1.0, 0, 0.4, 0, 0, 0, 1])
    b.add_shape_capsule(rocker, radius=0.04, half_height=0.2)
    b.add_joint_revolute(parent=-1, child=rocker, axis="Y",
                         xform_p=[1.0, 0, 0, 0, 0, 0, 1],
                         xform_c=[0, 0, -0.4, 0, 0, 0, 1])
    coupler = b.add_body(xform=[0.5, 0, 0.9, 0, 0, 0, 1])
    b.add_shape_capsule(coupler, radius=0.04, half_height=0.45)
    b.add_joint_free(coupler)
    # close the loop: coupler ends pinned to crank tip and rocker tip
    b.add_equality_constraint(nt.EqType.CONNECT, body1=crank, body2=coupler,
                              anchor=(0.0, 0.0, 0.5))
    b.add_equality_constraint(nt.EqType.CONNECT, body1=rocker, body2=coupler,
                              anchor=(0.0, 0.0, 0.4))
    m = b.finalize()
    solver = SolverKamino(m)
    # kick the crank so the mechanism actually swings (the all-vertical
    # start is a singular equilibrium)
    s = eval_fk(m, m.joint_q0,
                jnp.asarray(m.joint_qd0).at[0].set(2.0), m.state())
    ctrl = m.control()

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, ctrl, None, 1 / 240.), None
        return jax.lax.scan(sub, s, None, length=4)[0]
    for _ in range(120):
        s = frame(s)
    bq = np.asarray(s.body_q)
    assert np.isfinite(bq).all()
    # loop closure: crank tip stays attached to the coupler end
    tip_c = transform_point(s.body_q[0], jnp.asarray([0, 0, 0.5],
                                                     dtype=jnp.float32))
    # coupler-local anchor of the crank tip, from the initial poses
    a2 = np_transform_point(
        np_transform_inverse(np.array([0.5, 0, 0.9, 0, 0, 0, 1.0])),
        np.array([0.0, 0.0, 1.0]))
    tip_k = transform_point(s.body_q[2], jnp.asarray(a2, dtype=jnp.float32))
    drift = float(jnp.linalg.norm(tip_c - tip_k))
    assert drift < 2e-2, f"four-bar loop drift {drift}"
    # the mechanism actually swung
    assert abs(float(s.joint_q[0])) > 0.1


def test_kamino_heavy_stack_beats_pgs():
    """100:1 mass-ratio stack: the PADMM direct solve holds the stack where
    the diagonally-scaled Jacobi sweep sinks (the VERDICT acceptance test
    for a real Kamino; reference kamino/solver_kamino.py hard contacts)."""
    from newton_tpu.sim.collide import CollisionPipeline
    b = nt.ModelBuilder()
    b.add_articulation()
    zs = [0.25, 0.75, 1.25]
    for z, dn in zip(zs, [1000.0, 1000.0, 100000.0]):
        body = b.add_body(xform=[0, 0, z, 0, 0, 0, 1])
        b.add_shape_box(body, hx=0.25, hy=0.25, hz=0.25,
                        cfg=nt.ShapeConfig(density=dn))
        b.add_joint_free(body)
    b.add_ground_plane()
    m = b.finalize()

    def settle(solver):
        pipe = CollisionPipeline(m)
        s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
        ctrl = m.control()

        @jax.jit
        def frame(s):
            def sub(s, _):
                return solver.step(s, None, ctrl, pipe.collide(s),
                                   1.0 / 240.0), None
            return jax.lax.scan(sub, s, None, length=4)[0]
        for _ in range(120):
            s = frame(s)
        return np.abs(np.asarray(s.body_q)[:, 2] - np.array(zs)).max()

    err_pgs = settle(SolverFeatherstone(m, contact_iterations=8))
    err_adm = settle(SolverKamino(m, iterations=8))
    assert err_adm < 0.03, f"kamino stack error {err_adm}"
    assert err_pgs > 2 * err_adm, \
        f"PGS ({err_pgs}) should flunk where ADMM ({err_adm}) holds"


def test_coupled_consensus_momentum_transfer():
    """ADMM consensus coupling conserves momentum at shared contacts: a
    particle blob landing on a free-floating box exchanges momentum with it
    rather than creating or destroying it (VERDICT item 10 acceptance:
    assert momentum transfer error, not just stability)."""
    from newton_tpu.sim.collide import CollisionPipeline
    from newton_tpu.solvers import SolverXPBD

    b = nt.ModelBuilder(gravity=-10.0)
    box = b.add_body(xform=[0, 0, 0.0, 0, 0, 0, 1])
    b.add_shape_box(box, hx=0.4, hy=0.4, hz=0.1,
                    cfg=nt.ShapeConfig(density=500.0))
    b.add_joint_free(box)
    rng = np.random.RandomState(0)
    for p in rng.uniform(-0.2, 0.2, (40, 3)) * [1, 1, 0.5] + [0, 0, 0.5]:
        b.add_particle(p, (0, 0, 0), mass=0.05, radius=0.01)
    m = b.finalize()

    pipe = CollisionPipeline(m)
    rigid = SolverXPBD(m, iterations=2)
    part = SolverXPBD(m, iterations=2)
    solver = SolverCoupled(m, rigid, part, consensus_iters=4)
    s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
    s = solver.init_state(s)
    dt = 1.0 / 240.0

    def total_pz(s):
        mb = float(np.asarray(m.body_mass)[0])
        mp = np.asarray(m.particle_mass)
        return (mb * float(s.body_qd[0, 2])
                + float(np.sum(mp * np.asarray(s.particle_qd)[:, 2])))

    M_tot = float(np.asarray(m.body_mass)[0]) + \
        float(np.asarray(m.particle_mass).sum())
    p0 = total_pz(s)
    steps = 120
    step = jax.jit(lambda s: solver.step(s, None, m.control(),
                                         pipe.collide(s), dt))
    for _ in range(steps):
        s = step(s)
    # free space: d(total p_z)/dt must equal total weight, contact or not
    expected = p0 - 10.0 * M_tot * steps * dt
    got = total_pz(s)
    err = abs(got - expected) / abs(expected)
    assert err < 0.05, f"momentum transfer error {err:.3f}"
    # convergence measurement exists and the residual shrinks
    res = np.asarray(s.custom["coupled:residuals"])
    assert res.shape[0] == 4
    assert res[-1] <= res[0] + 1e-6, res


def test_coupled_body_partition_collision():
    """Arbitrary body partitions (reference: solver_coupled.py:327 Entry
    ownership): one ball owned by XPBD, the other by the generalized
    solver; a head-on elastic collision exchanges momentum symmetrically
    across the solver boundary."""
    import jax.numpy as jnp
    from newton_tpu.sim.collide import CollisionPipeline
    from newton_tpu.solvers import SolverMuJoCo, SolverXPBD

    b = nt.ModelBuilder(gravity=0.0)
    cfg = b.default_shape_cfg.copy()
    cfg.restitution = 0.9
    b0 = b.add_body(xform=[-0.5, 0, 0.5, 0, 0, 0, 1])
    b.add_shape_sphere(b0, radius=0.2, cfg=cfg)
    b.add_joint_free(b0)
    b1 = b.add_body(xform=[0.5, 0, 0.5, 0, 0, 0, 1])
    b.add_shape_sphere(b1, radius=0.2, cfg=cfg)
    b.add_joint_free(b1)
    m = b.finalize()
    pipe = CollisionPipeline(m)
    solver = SolverCoupled(
        m, rigid_solver=SolverXPBD(m, iterations=4),
        second_rigid_solver=SolverMuJoCo(m, iterations=8),
        body_partition=np.array([True, False]), consensus_iters=1)
    s = m.state()
    qd = np.zeros((2, 6))
    qd[0, 0], qd[1, 0] = 1.0, -1.0
    s = s.replace(body_qd=jnp.asarray(qd, dtype=s.body_qd.dtype))
    jqd = np.zeros(m.joint_dof_count)
    jqd[0], jqd[6] = 1.0, -1.0
    s = s.replace(joint_qd=jnp.asarray(jqd, dtype=s.joint_qd.dtype))

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, None, pipe.collide(s), 1 / 240.), None
        return jax.lax.scan(sub, s, None, length=4)[0]

    for _ in range(120):
        s = frame(s)
    v = np.asarray(s.body_qd)
    assert np.isfinite(np.asarray(s.body_q)).all()
    assert v[0, 0] < -0.7 and v[1, 0] > 0.7, v[:, 0]
    assert abs(v[0, 0] + v[1, 0]) < 0.1  # momentum preserved
