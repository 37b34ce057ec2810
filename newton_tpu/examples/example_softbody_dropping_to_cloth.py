"""A neo-Hookean FEM cube drops onto a pinned cloth sheet; both live in one
XPBD solve and interact through particle-particle contacts (reference:
newton/examples/multiphysics/example_softbody_dropping_to_cloth.py)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.solvers import SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder(gravity=-9.81)
        # trampoline sheet pinned along two opposite edges under the cube
        b.add_cloth_grid(pos=(-0.4, -0.4, 1.0), dim_x=12, dim_y=12,
                         cell_x=0.08, cell_y=0.08, mass=0.8, radius=0.04,
                         fix_left=True, fix_right=True,
                         tri_ke=800.0, edge_ke=2.0)
        self.n_cloth = b.particle_count
        # soft cube above the sheet center
        b.add_soft_grid(pos=(0.05, 0.05, 1.1), rot=None, vel=(0, 0, 0),
                        dim_x=3, dim_y=3, dim_z=3,
                        cell_x=0.07, cell_y=0.07, cell_z=0.07,
                        density=300.0, k_mu=1.0e3, k_lambda=1.0e3,
                        k_damp=1.0, radius=0.03)
        self.model = b.finalize()
        self.solver = SolverXPBD(self.model, iterations=6,
                                 enable_particle_particle=True,
                                 particle_max_per_cell=8)
        self.state = self.model.state()
        self.control = self.model.control()
        self.sim_dt = 1.0 / 480.0
        self.substeps = 8
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
        q = np.asarray(self.state.particle_q)
        assert np.isfinite(q).all()
        soft = q[self.n_cloth:]
        # the cube fell but was caught by the cloth (did not pass through)
        assert soft[:, 2].min() > 0.4, soft[:, 2].min()
        assert soft[:, 2].max() < 1.35
