"""Three cable cantilevers with increasing bend stiffness sag side by side
(reference: newton/examples/vbd/example_cable_bend_stiffness.py — same
scenario, solved here by SolverXPBD's split Cosserat cable constraints)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.solvers.solver_xpbd import SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=-9.81)
        self.kes = [0.5, 5.0, 100.0]
        self.tips = []
        for i, ke in enumerate(self.kes):
            bodies = builder.add_rod(
                [0.0, 0.3 * i, 1.0], [0.6, 0.3 * i, 1.0], segments=8,
                radius=0.01, joint="cable", bend_ke=ke, bend_kd=0.4,
                stretch_ke=2.0e4, stretch_kd=1.0, root_joint="fixed",
                key=f"cable_{i}")
            self.tips.append(bodies[-1])
        self.model = builder.finalize()
        self.solver = SolverXPBD(self.model, iterations=8)
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.sim_dt = 1.0 / 960.0
        self.substeps = 4
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
        q = np.asarray(self.state.body_q)
        assert np.isfinite(q).all()
        z = [float(q[t, 2]) for t in self.tips]
        # sag ordering follows bend stiffness
        assert z[0] < z[1] < z[2] <= 1.01, z
