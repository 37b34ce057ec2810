"""Per-world cartpole control through a selection view (reference:
newton/examples/selection/example_selection_cartpole.py): an
ArticulationView batch-reads pole angles across a cartpole farm and
batch-writes per-world cart forces — a bang-bang balance controller in
four lines of batched numpy."""

import jax
import jax.numpy as jnp
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
        q = self.view.get_dof_positions(state)
        tilt = 0.10 * np.where(np.arange(N_WORLDS) % 2 == 0, 1.0, -1.0)
        q = q.at[:, 1].set(jnp.asarray(tilt, q.dtype))
        state = self.view.set_dof_positions(state, q)
        self.state = self.view.eval_fk(state)
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        solver, view, dt = self.solver, self.view, self.sim_dt

        @jax.jit
        def frame(state):
            # batched full-state feedback: push the cart under the pole
            q = view.get_dof_positions(state)
            qd = view.get_dof_velocities(state)
            f = (150.0 * q[:, 1] + 20.0 * qd[:, 1]   # pole angle feedback
                 + 4.0 * q[:, 0] + 6.0 * qd[:, 0])   # cart recentering
            forces = jnp.zeros_like(q).at[:, 0].set(f)
            control = view.set_dof_forces(self.model.control(), forces)

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
        q = np.asarray(self.view.get_dof_positions(self.state))
        assert np.isfinite(q).all()
        # controller kept every pole near upright and carts bounded
        assert np.abs(q[:, 1]).max() < 0.15, q[:, 1]
        assert np.abs(q[:, 0]).max() < 0.9, q[:, 0]
