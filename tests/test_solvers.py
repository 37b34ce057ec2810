"""Solver physics-invariant tests (reference test strategy: step small scenes
and assert physical envelopes, e.g. example_basic_pendulum.py:115-137,
test_solver_xpbd.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD
from newton_tpu.solvers.generalized.solver import SolverFeatherstone


def sphere_scene():
    b = nt.ModelBuilder()
    body = b.add_body(xform=[0, 0, 1.0, 0, 0, 0, 1])
    b.add_shape_sphere(body, radius=0.5)
    b.add_joint_free(body)
    b.add_ground_plane()
    return b.finalize()


def pendulum_scene():
    b = nt.ModelBuilder()
    link = b.add_body(xform=[0.5, 0, 0, 0, 0, 0, 1])
    b.add_shape_box(link, hx=0.5, hy=0.05, hz=0.05)
    b.add_joint_revolute(parent=-1, child=link, axis="Y",
                         xform_c=[-0.5, 0, 0, 0, 0, 0, 1], armature=0.0)
    return b.finalize()


def run(model, solver, pipeline, frames, substeps=4, dt=1 / 240.):
    s = eval_fk(model, model.joint_q0, model.joint_qd0, model.state())
    ctrl = model.control()

    @jax.jit
    def frame(s):
        def sub(s, _):
            c = pipeline.collide(s) if pipeline is not None else None
            return solver.step(s, None, ctrl, c, dt), None
        return jax.lax.scan(sub, s, None, length=substeps)[0]

    traj = []
    for _ in range(frames):
        s = frame(s)
        traj.append(np.asarray(s.body_q))
    return s, np.stack(traj)


def assert_finite(state):
    for name in ("body_q", "body_qd", "joint_q", "joint_qd"):
        arr = np.asarray(getattr(state, name))
        assert np.isfinite(arr).all(), f"non-finite {name}"
    qn = np.linalg.norm(np.asarray(state.body_q)[:, 3:7], axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-3)


def test_xpbd_sphere_rests_on_ground():
    m = sphere_scene()
    solver = SolverXPBD(m, iterations=2)
    s, _ = run(m, solver, CollisionPipeline(m), frames=120)
    assert_finite(s)
    assert abs(float(s.body_q[0, 2]) - 0.5) < 0.02


def test_xpbd_pendulum_envelope():
    m = pendulum_scene()
    solver = SolverXPBD(m, iterations=4)
    s, traj = run(m, solver, None, frames=60)
    assert_finite(s)
    z = traj[:, 0, 2]
    x = traj[:, 0, 0]
    assert z.min() > -0.51 and z.max() < 0.05
    assert np.abs(x).max() < 0.51
    # anchor stays pinned
    d = np.linalg.norm(traj[:, 0, :3], axis=-1)
    np.testing.assert_allclose(d, 0.5, atol=5e-3)


def test_generalized_pendulum_energy():
    m = pendulum_scene()
    solver = SolverFeatherstone(m)
    s, traj = run(m, solver, None, frames=60)
    assert_finite(s)
    z = traj[:, 0, 2]
    # released horizontal: bounded by [-0.5, 0+] (generalized coords are
    # exactly on the constraint manifold)
    assert z.min() > -0.5001 and z.max() < 1e-3
    d = np.linalg.norm(traj[:, 0, :3], axis=-1)
    np.testing.assert_allclose(d, 0.5, atol=1e-5)


def test_generalized_ant_stands():
    b = nt.ModelBuilder()
    b.add_mjcf("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/"
               "mujoco/assets/ant.xml")
    m = b.finalize()
    solver = SolverFeatherstone(m, contact_iterations=8)
    s, _ = run(m, solver, CollisionPipeline(m), frames=60)
    assert_finite(s)
    h = float(s.joint_q[2])
    assert 0.3 < h < 0.8, f"ant torso height {h}"
    assert float(jnp.max(jnp.abs(s.joint_qd))) < 2.0


def test_reset_world_mask():
    sub = nt.ModelBuilder()
    body = sub.add_body(xform=[0, 0, 1.0, 0, 0, 0, 1])
    sub.add_shape_sphere(body, radius=0.5)
    sub.add_joint_free(body)
    b = nt.ModelBuilder()
    b.replicate(sub, 3)
    m = b.finalize()
    solver = SolverXPBD(m)
    s = m.state()
    moved = s.replace(body_q=s.body_q.at[:, 2].set(9.0))
    out = solver.reset(moved, world_mask=jnp.array([True, False, True]))
    z = np.asarray(out.body_q)[:, 2]
    np.testing.assert_allclose(z, [1.0, 9.0, 1.0], atol=1e-6)


def test_generalized_humanoid_crash_survival():
    """Humanoid falls, piles onto the ground, and the contact solve stays
    convergent (regression for the Jacobi divergence in dense pile-ups)."""
    b = nt.ModelBuilder()
    b.add_mjcf("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/"
               "mujoco/assets/humanoid.xml")
    m = b.finalize()
    solver = SolverFeatherstone(m, contact_iterations=12)
    s, _ = run(m, solver, CollisionPipeline(m), frames=260)
    assert_finite(s)
    h = float(s.joint_q[2])
    assert 0.02 < h < 0.4, f"humanoid rest height {h}"
    assert float(jnp.max(jnp.abs(s.joint_qd))) < 2.0


def test_muscle_contracts_bodies():
    """A muscle spanning two free bodies pulls them together when activated
    (reference: builder add_muscle / semi-implicit eval_muscles)."""
    from newton_tpu.solvers import SolverSemiImplicit
    b = nt.ModelBuilder(gravity=0.0)
    b1 = b.add_body(xform=[0, 0, 1, 0, 0, 0, 1])
    b.add_shape_box(b1, hx=0.1, hy=0.1, hz=0.1)
    b.add_joint_free(b1)
    b2 = b.add_body(xform=[1, 0, 1, 0, 0, 0, 1])
    b.add_shape_box(b2, hx=0.1, hy=0.1, hz=0.1)
    b.add_joint_free(b2)
    b.add_muscle([b1, b2], [(0.1, 0, 0), (-0.1, 0, 0)],
                 f0=50.0, lm=0.5, lt=0.1, lmax=1.0, pen=0.1)
    m = b.finalize()
    assert m.structure.muscle_count == 1
    solver = SolverSemiImplicit(m)
    ctrl = m.control()
    assert ctrl.muscle_activations.shape == (1,)

    s0 = m.state()

    @jax.jit
    def roll(s, act):
        c = ctrl.replace(muscle_activations=act)

        def sub(s, _):
            s = s.clear_forces()
            return solver.step(s, None, c, None, 1 / 1000.), None
        return jax.lax.scan(sub, s, None, length=200)[0]

    # zero activation: nothing moves
    s_off = roll(s0, jnp.zeros(1))
    np.testing.assert_allclose(np.asarray(s_off.body_q), np.asarray(s0.body_q),
                               atol=1e-6)
    # full activation: bodies approach each other symmetrically
    s_on = roll(s0, jnp.ones(1))
    gap = float(jnp.linalg.norm(s_on.body_q[1, :3] - s_on.body_q[0, :3]))
    assert gap < 0.9, f"muscle did not contract: gap={gap}"
    mid = np.asarray(s_on.body_q[0, :3] + s_on.body_q[1, :3]) / 2
    np.testing.assert_allclose(mid, [0.5, 0, 1.0], atol=1e-5)


def test_rod_bend_stiffness_cantilever():
    """add_rod bend stiffness acts through ball-joint PD drives: a stiff
    cantilever holds nearly horizontal, a soft one droops
    (reference: builder.py:7632 add_rod, CABLE joint bend/twist)."""
    def tip_z(bend_ke):
        b = nt.ModelBuilder()
        bodies = b.add_rod([0, 0, 1], [1, 0, 1], segments=6, radius=0.02,
                           bend_ke=bend_ke, bend_kd=2.0, root_joint="fixed")
        m = b.finalize()
        solver = SolverFeatherstone(m)
        s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
        ctrl = m.control()

        @jax.jit
        def frame(s):
            def sub(s, _):
                return solver.step(s, None, ctrl, None, 1 / 480.), None
            return jax.lax.scan(sub, s, None, length=8)[0]
        for _ in range(120):
            s = frame(s)
        assert np.isfinite(np.asarray(s.body_q)).all()
        return float(s.body_q[len(bodies) - 1, 2])

    stiff = tip_z(500.0)
    soft = tip_z(1.0)
    assert stiff > 0.9, f"stiff rod sags too much: {stiff}"
    assert soft < 0.35, f"soft rod barely sags: {soft}"


def test_rod_graph_builds_and_runs():
    """Branching rod network (reference: builder.py:7861 add_rod_graph)."""
    b = nt.ModelBuilder()
    pts = [[0, 0, 1], [0.5, 0, 1], [1.0, 0.3, 1], [1.0, -0.3, 1]]
    bodies = b.add_rod_graph(pts, [(0, 1), (1, 2), (1, 3)], bend_ke=50.0)
    assert len(bodies) == 3
    m = b.finalize()
    solver = SolverFeatherstone(m)
    s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
    ctrl = m.control()

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, ctrl, None, 1 / 480.), None
        return jax.lax.scan(sub, s, None, length=8)[0]
    for _ in range(30):
        s = frame(s)
    assert_finite(s)
    # free-fall: branch joints stay attached (shared-point coincidence)
    q = np.asarray(s.body_q)
    tip1 = q[1, :3]
    tip2 = q[2, :3]
    root_end = q[0, :3]
    assert np.isfinite(q).all()


def box_mesh(h):
    v = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                  for z in (-h, h)])
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5],
                  [0, 5, 1], [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4],
                  [1, 5, 7], [1, 7, 3]])
    return nt.Mesh(v.astype(np.float64), f.reshape(-1), is_solid=True)


def _two_box_stack(mesh: bool, x_off=0.1, z0=1.45):
    b = nt.ModelBuilder()
    base = b.add_body(xform=[0, 0, 0.5, 0, 0, 0, 1])
    top = b.add_body(xform=[x_off, 0, z0, 0, 0, 0, 1])
    for body in (base, top):
        if mesh:
            b.add_shape_mesh(body, mesh=box_mesh(0.5))
        else:
            b.add_shape_box(body, hx=0.5, hy=0.5, hz=0.5)
        b.add_joint_free(body)
    b.add_ground_plane()
    return b.finalize()


def _roll(m, solver, pipe, frames=120):
    s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
    ctrl = m.control()

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, ctrl, pipe.collide(s), 1 / 240.), None
        return jax.lax.scan(sub, s, None, length=4)[0]
    for _ in range(frames):
        s = frame(s)
    return np.asarray(s.body_q)


def test_xpbd_dynamic_dynamic_box_stack():
    """Offset box-on-box (both dynamic, starting 5 cm interpenetrated) must
    settle stacked: regression for (a) SAT corner contacts outside the
    overlap footprint, (b) depenetration launch, (c) missing positional
    friction."""
    m = _two_box_stack(mesh=False)
    from newton_tpu.solvers import SolverXPBD
    q = _roll(m, SolverXPBD(m, iterations=8), CollisionPipeline(m))
    assert np.isfinite(q).all()
    assert abs(q[0, 2] - 0.5) < 0.05 and abs(q[1, 2] - 1.5) < 0.08, q[:, 2]


def test_mesh_mesh_stack_generalized():
    """Mesh-box on mesh-box via baked SDFs: regression for the inverted
    normal convention in the bidirectional mesh-contact class and for
    vertex-only sample candidates (no face-interior coverage)."""
    m = _two_box_stack(mesh=True)
    q = _roll(m, SolverFeatherstone(m, contact_iterations=8),
              CollisionPipeline(m))
    assert np.isfinite(q).all()
    assert abs(q[0, 2] - 0.5) < 0.05 and abs(q[1, 2] - 1.5) < 0.08, q[:, 2]


def test_hydroelastic_contacts():
    """hydroelastic=True: contacts sit on the equal-pressure surface between
    the overlapping elastic bodies, and the stack stays stable
    (reference: geometry/sdf_hydroelastic.py HydroelasticSDF)."""
    m = _two_box_stack(mesh=True)
    pipe = CollisionPipeline(m, hydroelastic=True)
    s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
    c = pipe.collide(s)
    mask = np.asarray(c.rigid_contact_mask)
    s0 = np.asarray(c.rigid_contact_shape0)[mask]
    s1 = np.asarray(c.rigid_contact_shape1)[mask]
    pos = np.asarray(c.rigid_contact_position)[mask]
    mm = (s0 == 0) & (s1 == 1)
    # equal moduli: interface points inside the overlap band [0.95, 1.0]
    assert mm.any()
    assert (pos[mm][:, 2] > 0.94).all() and (pos[mm][:, 2] < 1.01).all()
    q = _roll(m, SolverFeatherstone(m, contact_iterations=8), pipe)
    assert np.isfinite(q).all()
    assert abs(q[1, 2] - 1.5) < 0.08, q[:, 2]


def test_avbd_rigid_stack_and_pendulum():
    """Rigid AVBD (reference rigid_vbd_kernels.py:83): per-body 6x6 block
    Newton with AL contact multipliers handles a dynamic box stack and a
    ball-jointed pendulum."""
    from newton_tpu.solvers import SolverVBD
    m = _two_box_stack(mesh=False, z0=1.51)
    # 8 AL sweeps: the clipped box-box manifold carries the full rim-point
    # set (r5), which needs two more multiplier updates to converge
    q = _roll(m, SolverVBD(m, iterations=8), CollisionPipeline(m))
    assert np.isfinite(q).all()
    assert abs(q[0, 2] - 0.5) < 0.05 and abs(q[1, 2] - 1.5) < 0.08, q[:, 2]

    b = nt.ModelBuilder()
    link = b.add_body(xform=[0.5, 0, 0, 0, 0, 0, 1])
    b.add_shape_box(link, hx=0.5, hy=0.05, hz=0.05)
    b.add_joint_ball(-1, link, xform_p=[0, 0, 0, 0, 0, 0, 1],
                     xform_c=[-0.5, 0, 0, 0, 0, 0, 1])
    m = b.finalize()
    solver = SolverVBD(m, iterations=6)
    s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
    ctrl = m.control()

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, ctrl, None, 1 / 240.), None
        return jax.lax.scan(sub, s, None, length=4)[0]
    traj = []
    for _ in range(60):
        s = frame(s)
        traj.append(np.asarray(s.body_q[0, :3]))
    traj = np.stack(traj)
    d = np.linalg.norm(traj, axis=1)
    np.testing.assert_allclose(d, 0.5, atol=2e-3)
    assert traj[:, 2].min() > -0.501 and traj[:, 2].max() < 0.05


def test_spatial_tendon_passive_elasticity():
    """Passive spatial-tendon stiffness: a stretched waypoint path pulls the
    endpoints back toward its rest length (reference: spatial tendons with
    stiffness; muscle passive term)."""
    from newton_tpu.solvers import SolverSemiImplicit
    b = nt.ModelBuilder(gravity=0.0)
    b1 = b.add_body(xform=[0, 0, 1, 0, 0, 0, 1])
    b.add_shape_box(b1, hx=0.1, hy=0.1, hz=0.1)
    b.add_joint_free(b1)
    b2 = b.add_body(xform=[2, 0, 1, 0, 0, 0, 1])
    b.add_shape_box(b2, hx=0.1, hy=0.1, hz=0.1)
    b.add_joint_free(b2)
    b.add_muscle([b1, b2], [(0.1, 0, 0), (-0.1, 0, 0)], f0=0.0, lm=1.0,
                 lt=0.0, lmax=3.0, pen=0.0, passive_ke=100.0, passive_kd=5.0)
    m = b.finalize()
    solver = SolverSemiImplicit(m)
    ctrl = m.control()
    s = m.state()

    @jax.jit
    def frame(s):
        def sub(s, _):
            s = s.clear_forces()
            return solver.step(s, None, ctrl, None, 1 / 1000.), None
        return jax.lax.scan(sub, s, None, length=10)[0]
    for _ in range(100):
        s = frame(s)
    gap = float(jnp.linalg.norm(s.body_q[1, :3] - s.body_q[0, :3]))
    assert np.isfinite(np.asarray(s.body_q)).all()
    assert gap < 1.6, f"passive tendon did not pull: {gap}"


def test_heterogeneous_worlds_keep_contacts():
    """Two worlds with the SAME articulation but different contact layouts
    (world 1 has an extra static box under the sphere) must both collide:
    the padded per-env contact plan replaces the old silent drop
    (generalized/solver.py heterogeneous branch)."""
    from newton_tpu.solvers.generalized.solver import SolverFeatherstone

    def build(extra_box: bool, worlds: int = 1):
        b = nt.ModelBuilder()
        for w in range(worlds):
            b.begin_world()
            b.add_articulation()
            body = b.add_body(xform=[0, 0, 1.0, 0, 0, 0, 1])
            b.add_shape_sphere(body, radius=0.3)
            b.add_joint_free(body)
            if extra_box and w == worlds - 1:
                b.add_shape_box(-1, xform=[0, 0, 0.2, 0, 0, 0, 1],
                                hx=0.5, hy=0.5, hz=0.2)
            b.end_world()
        b.add_ground_plane()
        return b.finalize()

    m = build(extra_box=True, worlds=2)
    solver = SolverFeatherstone(m, contact_iterations=8)
    plan = solver.contact_plans[0]
    assert plan is not None, "heterogeneous plan must not be dropped"
    assert not plan.uniform and plan.valid is not None

    def settle(model, solver):
        pipe = CollisionPipeline(model)
        s = model.state()
        ctrl = model.control()
        dt = 1.0 / 240.0

        @jax.jit
        def frame(s):
            def sub(s, _):
                return solver.step(s, None, ctrl, pipe.collide(s), dt), None
            return jax.lax.scan(sub, s, None, length=4)[0]
        for _ in range(120):
            s = frame(s)
        return s

    s = settle(m, solver)
    z = np.asarray(s.body_q)[:, 2]
    # world 0: rests on the ground at sphere radius
    assert abs(z[0] - 0.3) < 0.03, f"world-0 sphere z={z[0]}"
    # world 1: rests on the box top (0.4) + radius
    assert abs(z[1] - 0.7) < 0.03, f"world-1 sphere z={z[1]}"

    # world-0 trajectory matches an identical single-world model
    m1 = build(extra_box=False, worlds=1)
    s1 = settle(m1, SolverFeatherstone(m1, contact_iterations=8))
    np.testing.assert_allclose(z[0], np.asarray(s1.body_q)[0, 2], atol=5e-3)


def test_generalized_external_body_wrench():
    """State.body_f (MuJoCo xfrc_applied) enters the generalized dynamics:
    a pure torque on the pendulum tip equals the same generalized torque on
    the joint, and the transposed batched path agrees with the plain one
    (solvers/generalized/dynamics.py group_external_forces)."""
    from newton_tpu.parallel import batch_state

    m = pendulum_scene()
    dt = 1 / 240.0
    tau_y = 0.7                       # torque about the hinge axis (world Y)

    sol = SolverFeatherstone(m)
    s0 = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())

    # (a) torque via body_f on the single link == joint_f on the hinge dof
    s_bf = s0.replace(body_f=s0.body_f.at[0, 4].set(tau_y))
    ctrl = m.control()
    ctrl_jf = ctrl.replace(joint_f=ctrl.joint_f.at[0].set(tau_y))
    a = sol.step(s_bf, None, ctrl, None, dt)
    b = sol.step(s0, None, ctrl_jf, None, dt)
    np.testing.assert_allclose(np.asarray(a.joint_qd),
                               np.asarray(b.joint_qd), atol=1e-10)

    # an off-axis force also does something (lever arm through J^T)
    s_fx = s0.replace(body_f=s0.body_f.at[0, 2].set(5.0))  # +z force at COM
    c = sol.step(s_fx, None, ctrl, None, dt)
    assert abs(float(c.joint_qd[0]) - float(s0.joint_qd[0])) > 1e-6

    # (b) batched transposed path matches vmapped plain path
    sb = batch_state(s_bf, 3)
    got = jax.jit(lambda s: sol.step_batched(s, None, None, None, dt))(sb)
    np.testing.assert_allclose(np.asarray(got.joint_qd)[0],
                               np.asarray(a.joint_qd), rtol=0, atol=1e-6)

    # (c) opting out removes the effect
    off = SolverFeatherstone(m, apply_body_forces=False)
    d = off.step(s_bf, None, ctrl, None, dt)
    np.testing.assert_allclose(
        np.asarray(d.joint_qd),
        np.asarray(sol.step(s0, None, ctrl, None, dt).joint_qd), atol=1e-12)
