"""Hanging cloth under XPBD (reference: newton/examples/cloth/ family)."""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.solvers import SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder()
        builder.add_cloth_grid(pos=(0, 0, 1.0), dim_x=8, dim_y=8,
                               cell_x=0.1, cell_y=0.1, mass=1.0,
                               fix_top=True, tri_ke=500.0, edge_ke=5.0)
        self.model = builder.finalize()
        self.solver = SolverXPBD(self.model, iterations=8)
        self.state = self.model.state()
        self.control = self.model.control()
        self.sim_dt = 1.0 / 480.0
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
        pq = np.asarray(self.state.particle_q)
        assert np.isfinite(pq).all()
        # fixed row stays put, free rows hang below
        assert pq[:, 2].min() > -1.0
        fixed = np.asarray(self.model.particle_inv_mass) == 0
        np.testing.assert_allclose(pq[fixed, 2], 1.0, atol=1e-4)
        assert pq[~fixed, 2].mean() < 0.95
