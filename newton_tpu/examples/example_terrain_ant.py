"""Ant dropped onto procedural fractal terrain (direct heightfield SDF
collision; reference: examples terrain/rough-terrain locomotion family)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.geometry import generate_fractal_terrain
from newton_tpu.geometry.types import Heightfield
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers.generalized.solver import SolverFeatherstone


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder()
        builder.add_mjcf("/opt/venv/lib/python3.12/site-packages/gymnasium/"
                         "envs/mujoco/assets/ant.xml")
        hf = generate_fractal_terrain(nx=32, ny=32, size_x=12.0,
                                      size_y=12.0, amplitude=0.25, seed=3)
        builder.add_shape_heightfield(-1, heightfield=hf)
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverFeatherstone(self.model, contact_iterations=8)
        q0 = self.model.joint_q0
        q0 = q0.at[2].add(0.6)          # drop from above the bumps
        self.state = eval_fk(self.model, q0, self.model.joint_qd0,
                             self.model.state())
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
        q = np.asarray(self.state.joint_q)
        assert np.isfinite(np.asarray(self.state.body_q)).all()
        # torso settled on (not through) the terrain
        assert -0.3 < q[2] < 1.5, f"ant torso z {q[2]}"
