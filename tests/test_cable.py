"""Cable (Cosserat rod) joints: split stretch/shear/bend/twist stiffness.

Mirrors the reference's cable test intent (reference: builder.py:5166
add_joint_cable; vbd cable examples example_cable_bend_stiffness.py,
example_cable_twist_transfer.py): bend stiffness controls cantilever sag,
twist stiffness transports torsion along the rod, stretch stiffness
controls elongation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import newton_tpu as nt
from newton_tpu.math import quat_mul
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.enums import JointType
from newton_tpu.solvers.solver_xpbd import SolverXPBD


def _rollout(model, state, steps, dt, iterations=8):
    solver = SolverXPBD(model, iterations=iterations)

    @jax.jit
    def run(s):
        def sub(s, _):
            return solver.step(s, None, None, None, dt), None
        return jax.lax.scan(sub, s, None, length=steps)[0]

    return run(state)


def _cantilever(bend_ke, segments=6, kd=0.4):
    b = nt.ModelBuilder(gravity=-9.81)
    bodies = b.add_rod([0, 0, 1.0], [0.6, 0, 1.0], segments=segments,
                       radius=0.01, joint="cable", bend_ke=bend_ke,
                       bend_kd=kd, stretch_ke=2.0e4, stretch_kd=1.0,
                       root_joint="fixed")
    m = b.finalize()
    s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
    return m, s, bodies


def test_cable_builder_dof_layout():
    b = nt.ModelBuilder()
    b0 = b.add_body(xform=np.array([0, 0, 0, 0, 0, 0, 1.0]))
    b1 = b.add_body(xform=np.array([0, 0, 0.5, 0, 0, 0, 1.0]))
    j = b.add_joint_cable(b0, b1, stretch_stiffness=100.0,
                          shear_stiffness=50.0, bend_stiffness=2.0,
                          twist_stiffness=0.5, bend_damping=0.25)
    assert b.joint_type[j] == int(JointType.CABLE)
    d0 = b.joint_qd_start[j]
    ke = b.joint_target_ke[d0:d0 + 6]
    # [shear_x, shear_y, stretch_z, bend_x, bend_y, twist_z]
    assert ke == [50.0, 50.0, 100.0, 2.0, 2.0, 0.5]
    # cables carry no joint_q coordinates
    assert b.joint_q_start[j + 1] == b.joint_q_start[j]
    # shear/twist default to stretch/bend when omitted
    j2 = b.add_joint_cable(b0, b1, stretch_stiffness=10.0,
                           bend_stiffness=3.0, bend_damping=0.5)
    d2 = b.joint_qd_start[j2]
    assert b.joint_target_ke[d2:d2 + 6] == [10.0, 10.0, 10.0, 3.0, 3.0, 3.0]
    assert b.joint_target_kd[d2 + 5] == 0.5


def test_cable_bend_stiffness_controls_sag():
    tips = []
    for ke in (0.5, 5.0, 500.0):
        m, s, bodies = _cantilever(ke)
        s = _rollout(m, s, 1500, 1.0 / 960.0)
        q = np.asarray(s.body_q)
        assert np.isfinite(q).all()
        tips.append(float(q[bodies[-1], 2]))
    # stiffer rod sags less (anchor height 1.0)
    assert tips[0] < tips[1] < tips[2] <= 1.01
    assert tips[2] > 0.85  # nearly straight
    assert tips[0] < 0.7  # floppy rope droops


def test_cable_twist_relaxes():
    b = nt.ModelBuilder(gravity=0.0)
    bodies = b.add_rod([0, 0, 0], [0, 0, 0.8], segments=8, radius=0.01,
                       joint="cable", bend_ke=50.0, bend_kd=0.5,
                       twist_ke=20.0, twist_kd=0.5,
                       stretch_ke=2.0e4, stretch_kd=1.0, root_joint="fixed")
    m = b.finalize()
    s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
    # twist the free tip 90 degrees about the rod tangent
    qz = jnp.asarray([0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)],
                     dtype=s.body_q.dtype)
    tip = bodies[-1]
    s = s.replace(body_q=s.body_q.at[tip, 3:7].set(
        quat_mul(qz[None], s.body_q[tip:tip + 1, 3:7])[0]))
    s = _rollout(m, s, 400, 1.0 / 960.0)
    q = np.asarray(s.body_q)
    assert np.isfinite(q).all()
    # torsion has drained out through the fixed root: all quats near identity
    assert np.abs(q[:, 5]).max() < 0.15, q[:, 5]


def test_cable_stretch_stiffness_controls_elongation():
    lengths = []
    for ke in (200.0, 2.0e5):
        b = nt.ModelBuilder(gravity=-9.81)
        bodies = b.add_rod([0, 0, 1.0], [0, 0, 0.2], segments=4,
                           radius=0.02, density=5000.0, joint="cable",
                           bend_ke=1.0, bend_kd=0.1, stretch_ke=ke,
                           stretch_kd=2.0, root_joint="fixed")
        m = b.finalize()
        s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
        s = _rollout(m, s, 300, 1.0 / 480.0)
        q = np.asarray(s.body_q)
        assert np.isfinite(q).all()
        lengths.append(1.0 - float(q[bodies[-1], 2]))  # hang depth
    # rest: tip body center sits mid-segment at z = 0.3 -> depth 0.7
    assert lengths[0] > lengths[1] + 1e-3  # soft cable stretches further
    assert lengths[1] == pytest.approx(0.7, abs=0.05)  # stiff holds length


def test_vbd_cable_bend_stiffness():
    """SolverVBD solves cable joints through AVBD anisotropic penalty
    energies (reference: VBD is the cable home, rigid_vbd_kernels.py:421)."""
    from newton_tpu.solvers import SolverVBD
    tips = []
    for ke in (0.5, 500.0):
        b = nt.ModelBuilder(gravity=-9.81)
        bodies = b.add_rod([0, 0, 1.0], [0.6, 0, 1.0], segments=6,
                           radius=0.01, joint="cable", bend_ke=ke,
                           stretch_ke=2.0e4, root_joint="fixed")
        m = b.finalize()
        s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
        solver = SolverVBD(m, iterations=6)

        @jax.jit
        def run(s):
            def sub(s, _):
                return solver.step(s, None, None, None, 1 / 960.0), None
            return jax.lax.scan(sub, s, None, length=600)[0]

        s = run(s)
        q = np.asarray(s.body_q)
        assert np.isfinite(q).all()
        tips.append(float(q[bodies[-1], 2]))
    assert tips[0] < tips[1] <= 1.01, tips
    assert tips[1] > 0.9
