"""Viscous honey column: deviatoric plastic relaxation makes the material
creep outward slowly instead of collapsing like sand (reference:
newton/examples/mpm/example_mpm_viscous.py)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.solvers.solver_mpm import SolverImplicitMPM


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder()
        builder.add_particle_grid(pos=(-0.12, -0.12, 0.05), dim_x=8, dim_y=8,
                                  dim_z=12, cell_x=0.03, cell_y=0.03,
                                  cell_z=0.03, mass=0.02, radius=0.012)
        self.model = builder.finalize()
        self.solver = SolverImplicitMPM(
            self.model, grid_lower=(-1, -1, 0), grid_upper=(1, 1, 2),
            resolution=48, material="viscous", viscous_relax=0.25,
            young=5.0e4, implicit_iterations=8)
        self.state = self.solver.init_state(self.model.state())
        self.sim_dt = 1.5e-3
        self.substeps = 10
        self.time = 0.0
        viewer.set_model(self.model)
        self.r0 = float(np.abs(np.asarray(
            self.model.particle_q)[:, :2]).max())

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
        assert pq[:, 2].min() > -0.05
        # the column slumped and spread beyond its initial footprint
        assert np.abs(pq[:, :2]).max() > self.r0 + 0.02
