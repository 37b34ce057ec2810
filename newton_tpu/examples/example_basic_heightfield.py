"""Spheres rolling down a procedural heightfield valley (reference:
newton/examples/basic/example_basic_heightfield.py)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.geometry.types import Heightfield
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers.solver_xpbd import SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=-9.81)

        # valley: parabolic cross-section in y, gentle slope in x
        n = 24
        xs = np.linspace(-1, 1, n)
        ys = np.linspace(-1, 1, n)
        X, Y = np.meshgrid(xs, ys, indexing="ij")
        hts = (0.6 * Y ** 2 - 0.15 * X).astype(np.float64)
        hf = Heightfield(hts, size_x=6.0, size_y=6.0)
        builder.add_shape_heightfield(body=-1, heightfield=hf,
                                      key="terrain")

        self.balls = []
        for i in range(3):
            bb = builder.add_body(
                xform=[-2.0, -1.5 + 1.5 * i, 1.6, 0, 0, 0, 1],
                key=f"ball_{i}")
            builder.add_shape_sphere(bb, radius=0.25, key=f"ball_shape_{i}")
            builder.add_joint_free(bb, key=f"ball_free_{i}")
            self.balls.append(bb)
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=4)
        self.state = self.model.state()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        solver, pipe, dt = self.solver, self.pipeline, self.sim_dt

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, None, pipe.collide(s), dt), None
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
        for bb in self.balls:
            # still above the terrain floor, inside the field bounds
            assert -1.0 < q[bb, 2] < 2.0, q[bb]
            assert abs(q[bb, 0]) < 3.2 and abs(q[bb, 1]) < 3.2
