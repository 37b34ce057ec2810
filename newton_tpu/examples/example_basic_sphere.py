"""Sphere dropping onto the ground plane under XPBD (reference:
newton/examples/basic/ example family)."""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder()
        body = builder.add_body(xform=[0, 0, 1.0, 0, 0, 0, 1], key="ball")
        builder.add_shape_sphere(body, radius=0.5)
        builder.add_joint_free(body)
        builder.add_ground_plane()
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=2)
        self.state = self.model.state()
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
        z = float(self.state.body_q[0, 2])
        assert abs(z - 0.5) < 0.05, f"sphere rest height {z}"
