"""Cantilevered elastic rod: bend stiffness via ball-joint drives
(reference: newton/examples/basic example family + builder.py:7632 add_rod)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.solvers.generalized.solver import SolverFeatherstone


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder()
        self.bodies = builder.add_rod([0, 0, 1.0], [1.0, 0, 1.0], segments=8,
                                      radius=0.02, bend_ke=200.0, bend_kd=3.0,
                                      root_joint="fixed", key="rod")
        self.model = builder.finalize()
        self.solver = SolverFeatherstone(self.model)
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.control = self.model.control()
        self.sim_dt = 1.0 / 480.0
        self.substeps = 8
        self.time = 0.0
        viewer.set_model(self.model)

        solver, control, dt = self.solver, self.control, self.sim_dt

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, control, None, dt), None
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
        q = np.asarray(self.state.body_q)
        assert np.isfinite(q).all()
        tip_z = float(q[self.bodies[-1], 2])
        # stiff rod sags but holds most of its height
        assert 0.6 < tip_z <= 1.01, f"rod tip z {tip_z}"
