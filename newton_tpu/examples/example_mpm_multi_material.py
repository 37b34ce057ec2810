"""Three MPM columns — sand, snow, viscous honey — collapse side by side in
one solve with per-particle materials (reference:
newton/examples/mpm/example_mpm_multi_material.py)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.solvers.solver_mpm import SolverImplicitMPM


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder()
        self.ranges = []
        mat_ids = []
        for mat, x0 in ((0, -0.55), (1, -0.12), (2, 0.31)):
            start = builder.particle_count
            builder.add_particle_grid(pos=(x0, -0.12, 0.05), dim_x=6,
                                      dim_y=6, dim_z=10, cell_x=0.035,
                                      cell_y=0.035, cell_z=0.035,
                                      mass=0.02, radius=0.014)
            n = builder.particle_count - start
            mat_ids += [mat] * n
            self.ranges.append((start, builder.particle_count))
        self.model = builder.finalize()
        self.solver = SolverImplicitMPM(
            self.model, grid_lower=(-1, -1, 0), grid_upper=(1, 1, 1.5),
            resolution=48, material_id=np.asarray(mat_ids),
            friction_angle=0.6, viscous_relax=0.25,
            implicit_iterations=8)
        self.state = self.solver.init_state(self.model.state())
        self.sim_dt = 1.5e-3
        self.substeps = 10
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
        assert pq[:, 2].min() > -0.05
        heights = []
        for s, e in self.ranges:
            heights.append(float(pq[s:e, 2].max()))
        # snow column holds the most height, sand collapses flattest
        assert heights[1] > heights[0] - 0.02, heights
