"""Granular pile angle of repose (reference:
newton/examples/mpm/example_mpm_granular.py): a tall thin sand column
collapses and spreads into a pile whose slope is set by the friction
angle — the canonical granular-media validation for MLS-MPM."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.solvers.solver_mpm import SolverImplicitMPM


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder()
        # tall 1:4 aspect column — collapses hard
        builder.add_particle_grid(pos=(-0.08, -0.08, 0.02), dim_x=5,
                                  dim_y=5, dim_z=20, cell_x=0.032,
                                  cell_y=0.032, cell_z=0.032, mass=0.02,
                                  radius=0.013)
        self.model = builder.finalize()
        self.solver = SolverImplicitMPM(self.model, grid_lower=(-1, -1, 0),
                                        grid_upper=(1, 1, 2), resolution=48,
                                        friction_angle=0.7)
        self.state = self.solver.init_state(self.model.state())
        self.h0 = float(np.asarray(self.state.particle_q)[:, 2].max())
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
        assert pq[:, 2].min() > -0.05, "sand fell through the grid floor"
        # the column collapsed (height dropped) and spread (radius grew)
        h = pq[:, 2].max()
        r = np.sqrt(pq[:, 0] ** 2 + pq[:, 1] ** 2).max()
        assert h < 0.85 * self.h0, (h, self.h0)
        assert r > 0.14, r
        # friction keeps it a pile, not a puddle: finite repose height
        assert h > 0.05, h
