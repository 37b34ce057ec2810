"""Torsion transport along a cable: a kinematic spindle spins one end and the
twist stiffness carries the rotation to the free end (reference:
newton/examples/vbd/example_cable_twist_transfer.py — same scenario, solved
here by SolverXPBD's split Cosserat cable constraints)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.builder import np_transform
from newton_tpu.solvers.solver_xpbd import SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=0.0)
        # kinematic spindle spinning about +x at a fixed rate
        self.omega = 4.0  # rad/s
        q_y = np.array([0.0, np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4)])
        spindle = builder.add_body(
            xform=np_transform(np.array([-0.05, 0.0, 1.0]), q_y),
            qd=np.array([0.0, 0.0, 0.0, self.omega, 0.0, 0.0]),
            kinematic=True, key="spindle")
        builder.add_shape_capsule(spindle, radius=0.02, half_height=0.04,
                                  key="spindle_shape")
        # cable along +x; segment material tangent (+Z local) points along +x
        self.bodies = builder.add_rod(
            [0.0, 0.0, 1.0], [0.8, 0.0, 1.0], segments=10, radius=0.01,
            joint="cable", bend_ke=20.0, bend_kd=0.2,
            twist_ke=8.0, twist_kd=0.1,
            stretch_ke=2.0e4, stretch_kd=1.0,
            root_joint="free", key="cable")
        # weld the first segment to the spinning spindle through a cable
        # joint whose anchors share the +x material tangent
        builder.add_joint_cable(
            spindle, self.bodies[0],
            xform_p=np_transform(np.array([0.0, 0.0, 0.05])),
            xform_c=np_transform(np.array([0.0, 0.0, -0.04])),
            stretch_stiffness=2.0e4, stretch_damping=1.0,
            bend_stiffness=50.0, bend_damping=0.5,
            twist_stiffness=20.0, twist_damping=0.2, key="drive")
        self.model = builder.finalize()
        self.solver = SolverXPBD(self.model, iterations=8)
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.sim_dt = 1.0 / 960.0
        self.substeps = 8
        self.time = 0.0
        viewer.set_model(self.model)

        solver, dt = self.solver, self.sim_dt

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, None, None, dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame

    def step(self):
        self.state = self._frame(self.state)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        qd = np.asarray(self.state.body_qd)
        assert np.isfinite(np.asarray(self.state.body_q)).all()
        # the free tip has picked up rotation about the cable axis (+x)
        tip_wx = float(qd[self.bodies[-1], 3])
        assert tip_wx > 0.3 * self.omega, tip_wx
