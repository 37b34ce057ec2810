"""Cloth dropped over a rigid ball: two-way coupled co-simulation
(reference: newton/examples/ coupled solver family)."""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverCoupled, SolverVBD, SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder()
        body = builder.add_body(xform=[0.25, 0.25, 0.5, 0, 0, 0, 1],
                                key="ball")
        builder.add_shape_sphere(body, radius=0.2)
        builder.add_joint_free(body)
        builder.add_ground_plane()
        builder.add_cloth_grid(pos=(0, 0, 1.0), dim_x=8, dim_y=8,
                               cell_x=0.08, cell_y=0.08, mass=0.5,
                               tri_ke=500.0, edge_ke=2.0)
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverCoupled(
            self.model,
            rigid_solver=SolverXPBD(self.model, iterations=2),
            particle_solver=SolverVBD(self.model, iterations=2))
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
                return solver.step(s, None, control, pipeline.collide(s),
                                   dt), None
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
        assert np.isfinite(np.asarray(self.state.particle_q)).all()
        assert np.isfinite(np.asarray(self.state.body_q)).all()
