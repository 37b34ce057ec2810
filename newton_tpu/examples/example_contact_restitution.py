"""Restitution sweep: three balls with e = 0.1 / 0.5 / 0.9 dropped from the
same height — rebound heights must be ordered by restitution (reference:
contact restitution handling, xpbd velocity pass; examples/contacts family).
"""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD


class Example:
    RESTITUTIONS = (0.1, 0.5, 0.9)

    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        for i, e in enumerate(self.RESTITUTIONS):
            body = b.add_body(xform=[i * 1.0, 0, 1.0, 0, 0, 0, 1],
                              key=f"ball_{e}")
            b.add_shape_sphere(body, radius=0.2,
                               cfg=nt.ShapeConfig(restitution=e))
            b.add_joint_free(body)
        b.add_ground_plane()
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=2,
                                 enable_restitution=True)
        self.state = self.model.state()
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        self.max_height = np.zeros(3)
        self.bounced = np.zeros(3, dtype=bool)
        viewer.set_model(self.model)

        pipeline, solver, control, dt = (self.pipeline, self.solver,
                                         self.control, self.sim_dt)

        @jax.jit
        def frame(state):
            def sub(s, _):
                c = pipeline.collide(s)
                return solver.step(s, None, control, c, dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame

    def step(self):
        self.state = self._frame(self.state)
        self.time += self.sim_dt * self.substeps
        z = np.asarray(self.state.body_q[:, 2])
        vz = np.asarray(self.state.body_qd[:, 2])
        # track rebound apex after first impact (upward motion above floor)
        going_up = vz > 0.05
        self.bounced |= going_up
        self.max_height = np.where(self.bounced & (z > self.max_height),
                                   z, self.max_height)

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        h = self.max_height
        assert self.bounced.all(), f"not all balls rebounded: {self.bounced}"
        assert h[0] < h[1] < h[2], f"rebound heights not ordered: {h}"
        assert np.isfinite(np.asarray(self.state.body_q)).all()


if __name__ == "__main__":
    from newton_tpu.examples import init, run
    viewer, args = init()
    run(Example(viewer, args), args)
