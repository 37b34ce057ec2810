"""Soft-body beam pinned at its left face sags under gravity — a
neo-Hookean FEM cantilever (reference:
examples/softbody/example_softbody_hanging.py).
"""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.solvers import SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        self.parts = b.add_soft_grid(
            pos=(0.0, -0.1, 1.0), rot=None, vel=(0, 0, 0),
            dim_x=6, dim_y=2, dim_z=2,
            cell_x=0.1, cell_y=0.1, cell_z=0.1,
            density=80.0, k_mu=2.0e3, k_lambda=2.0e3, k_damp=2.0,
            fix_left=True, radius=0.03)
        self.model = b.finalize()
        self.solver = SolverXPBD(self.model, iterations=6)
        self.state = self.model.state()
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)
        self.tip0 = float(np.asarray(self.model.particle_q)[:, 2].min())

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
        # the free tip sagged below the beam's initial bottom plane
        tip = q[:, 2].min()
        assert tip < self.tip0 - 0.02, f"no sag: {tip} vs {self.tip0}"
        # the pinned face did not move
        q0 = np.asarray(self.model.particle_q)
        pinned = np.isclose(q0[:, 0], 0.0)
        assert np.allclose(q[pinned], q0[pinned], atol=1e-6)
        # volume preservation keeps the beam from collapsing entirely
        assert tip > self.tip0 - 0.6


if __name__ == "__main__":
    from newton_tpu.examples import init, run
    viewer, args = init()
    run(Example(viewer, args), args)
