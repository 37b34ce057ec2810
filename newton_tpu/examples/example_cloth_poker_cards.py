"""Stiff poker cards flutter down and land flat (reference:
newton/examples/cloth/example_cloth_poker_cards.py — card-stiff cloth):
three high-bending-stiffness cloth rectangles released at different
heights/yaws settle on the ground as rigid-like planar cards. The gate is
planarity — card-grade bending stiffness must keep each sheet flat within
millimetres while the soft reference material would crumple."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD

CARDS = 3
NX, NY = 6, 4
CELL = 0.018


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=-9.81)
        self.card_particles = []
        for i in range(CARDS):
            ang = 0.5 * i
            rot = np.array([0.0, 0.0, np.sin(ang / 2), np.cos(ang / 2)])
            idx = builder.add_cloth_grid(
                pos=(0.22 * i - 0.2, 0.12 * i, 0.25 + 0.12 * i), rot=rot,
                dim_x=NX, dim_y=NY, cell_x=CELL, cell_y=CELL,
                mass=0.01, radius=0.006,
                tri_ke=2.0e4, tri_ka=2.0e4, tri_kd=1.0,
                edge_ke=200.0, edge_kd=0.5)
            self.card_particles.append(np.asarray(idx))
        builder.add_ground_plane()
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=8)
        self.state = self.model.state()
        self.sim_dt = 1.0 / 480.0
        self.substeps = 8
        self.time = 0.0
        viewer.set_model(self.model)

        solver, pipe, dt = self.solver, self.pipeline, self.sim_dt

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, None, pipe.collide(s), dt), None
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
        for i, idx in enumerate(self.card_particles):
            card = pq[idx]
            # landed: every vertex near the contact rest height
            assert card[:, 2].max() < 0.1, (i, card[:, 2].max())
            assert card[:, 2].min() > -0.01, (i, card[:, 2].min())
            # planarity: best-fit plane residual stays card-thin
            c = card - card.mean(axis=0)
            sv = np.linalg.svd(c, compute_uv=False)
            assert sv[-1] < 0.015, (i, sv)
