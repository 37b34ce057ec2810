"""100:1 mass-ratio box stack held by the Kamino PADMM contact solver
(reference: kamino hard-contact scenes; the diagonally-scaled Jacobi sweep
sinks on this scene at the same iteration count)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverKamino


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        b.add_articulation()
        self.zs = [0.25, 0.75, 1.25]
        for z, dn in zip(self.zs, [1000.0, 1000.0, 100000.0]):
            body = b.add_body(xform=[0, 0, z, 0, 0, 0, 1])
            b.add_shape_box(body, hx=0.25, hy=0.25, hz=0.25,
                            cfg=nt.ShapeConfig(density=dn))
            b.add_joint_free(body)
        b.add_ground_plane()
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverKamino(self.model, iterations=8)
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
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

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        z = np.asarray(self.state.body_q)[:, 2]
        err = np.abs(z - np.asarray(self.zs)).max()
        assert err < 0.06, f"heavy stack sank: {err}"
