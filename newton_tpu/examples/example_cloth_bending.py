"""Bending stiffness in draping cloth: two sheets hang from their top edge,
one floppy and one stiff; the dihedral bending energy keeps the stiff sheet
from curling (reference: newton/examples/cloth/example_cloth_bending.py,
solved here by SolverVBD's cloth Newton with bending energy)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.solvers import SolverVBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder(gravity=-9.81)
        self.counts = []
        for i, edge_ke in enumerate((0.02, 20.0)):
            start = b.particle_count
            b.add_cloth_grid(pos=(0.0, 0.6 * i, 1.2), dim_x=8, dim_y=8,
                             cell_x=0.06, cell_y=0.06, mass=0.5,
                             fix_top=True, tri_ke=500.0, tri_kd=5.0,
                             edge_ke=edge_ke, edge_kd=0.02)
            self.counts.append((start, b.particle_count))
        self.model = b.finalize()
        self.solver = SolverVBD(self.model, iterations=4)
        self.state = self.model.state()
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
        q = np.asarray(self.state.particle_q)
        assert np.isfinite(q).all()
        # stiff sheet drapes wider (carries its lower edge further out)
        spans = []
        for s, e in self.counts:
            spans.append(q[s:e, 0].max() - q[s:e, 0].min())
        assert spans[1] > spans[0] - 0.02, spans
        # both sheets have draped below their pinned row
        assert q[:, 2].min() < 1.15
