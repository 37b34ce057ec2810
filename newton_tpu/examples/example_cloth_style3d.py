"""Two garment panels sewn at the shoulders drape over a capsule torso
under the Style3D projective-dynamics solver (reference:
newton/examples/cloth/example_cloth_style3d.py — panel assembly + seams
from the Style3D builder, style3d/builder.py)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverStyle3D

DIM = 10
CELL = 0.05


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder(gravity=-9.81)
        # capsule "torso" lying horizontally (static world shape)
        q_y = np.array([0.0, np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4)])
        b.add_shape_capsule(-1, radius=0.16, half_height=0.2,
                            xform=np.concatenate([[0.25, 0.25, 0.9], q_y]),
                            key="torso_shape")
        b.add_ground_plane()

        # front and back panels, vertical, on either side of the torso
        q_x = np.array([np.sin(np.pi / 4), 0.0, 0.0, np.cos(np.pi / 4)])
        panels = []
        for k, y in enumerate((0.06, 0.46)):
            start = b.particle_count
            b.add_cloth_grid(pos=(0.0, y, 1.15), rot=q_x, dim_x=DIM,
                             dim_y=DIM, cell_x=CELL, cell_y=CELL,
                             mass=0.4, radius=0.02,
                             tri_ke=800.0, tri_kd=8.0, edge_ke=0.5)
            panels.append(start)
        n = (DIM + 1) ** 2
        # top rows of both panels (the grid's last row in its local frame)
        top_a = [panels[0] + DIM * (DIM + 1) + i for i in range(DIM + 1)]
        top_b = [panels[1] + DIM * (DIM + 1) + i for i in range(DIM + 1)]
        # sew shoulder seams: outer thirds joined, neck opening in between
        third = (DIM + 1) // 3
        seam_a = top_a[:third] + top_a[-third:]
        seam_b = top_b[:third] + top_b[-third:]
        b.sew_particles(seam_a, seam_b, ke=3.0e3, kd=2.0, shrink=0.9)
        self.n_total = b.particle_count
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverStyle3D(self.model, iterations=6,
                                    contact_ke=2.0e4)
        self.state = self.model.state()
        self.control = self.model.control()
        self.sim_dt = 1.0 / 480.0
        self.substeps = 8
        self.time = 0.0
        viewer.set_model(self.model)

        solver, pipe, control, dt = (self.solver, self.pipeline,
                                     self.control, self.sim_dt)

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, control, pipe.collide(s), dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame
        self.seams = (seam_a, seam_b)

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
        # seams pulled the panels together at the shoulders
        a, bb = self.seams
        gap = np.linalg.norm(q[a] - q[bb], axis=-1).mean()
        assert gap < 0.25, gap
        # the garment hangs on the torso, not fallen to the floor
        assert q[:, 2].max() > 0.9
