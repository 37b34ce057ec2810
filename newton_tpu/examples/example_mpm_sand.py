"""Sand column collapse under MLS-MPM (reference: newton/examples/mpm_*)."""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.solvers.solver_mpm import SolverImplicitMPM


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder()
        builder.add_particle_grid(pos=(-0.15, -0.15, 0.4), dim_x=8, dim_y=8,
                                  dim_z=10, cell_x=0.04, cell_y=0.04,
                                  cell_z=0.04, mass=0.02, radius=0.015)
        self.model = builder.finalize()
        self.solver = SolverImplicitMPM(self.model, grid_lower=(-1, -1, 0),
                                        grid_upper=(1, 1, 2), resolution=48,
                                        friction_angle=0.6)
        self.state = self.solver.init_state(self.model.state())
        self.sim_dt = 4e-4
        self.substeps = 25
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
        pq = np.asarray(self.state.particle_q)
        assert np.isfinite(pq).all()
        assert pq[:, 2].min() > -0.1
