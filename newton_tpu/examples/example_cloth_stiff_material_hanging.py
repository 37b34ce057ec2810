"""Stiff vs soft cloth hanging under gravity (reference:
newton/examples/vbd/example_cloth_stiff_material_hanging.py): two
pinned-edge cloth panels with a 40x stretch-stiffness ratio hang side by
side — the stiff panel must elongate visibly less under its own weight,
without the explicit-integrator blow-up stiff materials usually cause
(XPBD's compliance formulation is stiffness-independent in dt)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.solvers import SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=-9.81)
        # panels start already vertical (rotated -90 deg about x, pinned at
        # the top edge) so the gate measures material stretch, not a long
        # drape transient
        rot = np.array([-np.sin(np.pi / 4), 0.0, 0.0, np.cos(np.pi / 4)])
        kw = dict(dim_x=10, dim_y=10, cell_x=0.06, cell_y=0.06, mass=0.5,
                  tri_kd=0.5, edge_ke=0.5, edge_kd=0.02, rot=rot,
                  fix_bottom=True)
        self.soft = builder.add_cloth_grid(pos=(0.0, -0.8, 1.5),
                                           tri_ke=500.0, **kw)
        self.stiff = builder.add_cloth_grid(pos=(0.0, 0.8, 1.5),
                                            tri_ke=20000.0, **kw)
        self.model = builder.finalize()
        self.solver = SolverXPBD(self.model, iterations=8)
        self.state = self.model.state()
        self.sim_dt = 1.0 / 480.0
        self.substeps = 8
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
        soft_low = pq[self.soft, 2].min()
        stiff_low = pq[self.stiff, 2].min()
        # both panels hang below the pin line; the 40x-stiffer panel
        # elongates measurably less under its own weight
        assert soft_low < 1.0 and stiff_low < 1.0, (soft_low, stiff_low)
        assert stiff_low > soft_low + 0.03, (soft_low, stiff_low)
