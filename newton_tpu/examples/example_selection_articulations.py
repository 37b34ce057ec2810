"""Batched selection over a replicated robot farm: an ArticulationView
reads and writes dof state across 8 cartpole worlds at once, applying a
per-world impulse pattern and reading back the batched response
(reference: newton/examples/selection/example_selection_articulations.py)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.solvers.generalized.solver import SolverFeatherstone
from newton_tpu.utils.selection import ArticulationView

XML = ("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/"
       "assets/inverted_pendulum.xml")
N_WORLDS = 8


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        robot = nt.ModelBuilder()
        robot.add_mjcf(XML)
        builder = nt.ModelBuilder()
        builder.replicate(robot, N_WORLDS, spacing=(0.0, 1.0, 0.0))
        self.model = builder.finalize()
        self.view = ArticulationView(self.model, "*")
        self.solver = SolverFeatherstone(self.model)
        state = self.model.state()
        # alternate initial pole tilts across worlds through the view
        q = self.view.get_dof_positions(state)
        tilt = 0.12 * np.where(np.arange(N_WORLDS) % 2 == 0, 1.0, -1.0)
        q = q.at[:, 1].set(tilt)
        state = self.view.set_dof_positions(state, q)
        self.state = self.view.eval_fk(state)
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
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
        q = self.view.get_dof_positions(self.state)
        qn = np.asarray(q)
        assert qn.shape == (N_WORLDS, 2)
        assert np.isfinite(qn).all()
        # poles fall in the direction of their initial tilt
        signs = np.where(np.arange(N_WORLDS) % 2 == 0, 1.0, -1.0)
        assert (qn[:, 1] * signs > 0.05).all(), qn[:, 1]
