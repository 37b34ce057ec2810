"""Cable pile: several free elastic rods dropped from different heights and
orientations collapse into a pile on the ground — rod-rod and rod-ground
contact plus CABLE-joint bend/twist compliance under XPBD (reference:
examples/cable/example_cable_pile.py).
"""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        rng = np.random.default_rng(3)
        self.rods = []
        n_seg = 6
        for k in range(5):
            a = rng.uniform(0, 2 * np.pi)
            c, s = np.cos(a), np.sin(a)
            x0 = np.array([rng.uniform(-0.2, 0.2),
                           rng.uniform(-0.2, 0.2), 0.6 + 0.35 * k])
            d = np.array([c, s, 0.0]) * 0.8
            pts = [x0 + d * (i / n_seg) for i in range(n_seg + 1)]
            edges = [(i, i + 1) for i in range(n_seg)]
            bodies = b.add_rod_graph(pts, edges, radius=0.03,
                                     density=800.0, joint="cable",
                                     bend_ke=20.0, bend_kd=0.5,
                                     twist_ke=10.0, twist_kd=0.2,
                                     key=f"rod{k}")
            self.rods.append(bodies)
        b.add_ground_plane()
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=6)
        self.state = self.model.state()
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        pipeline, solver, control, dt = (self.pipeline, self.solver,
                                         self.control, self.sim_dt)

        @jax.jit
        def frame(state):
            def sub(s, _):
                c = pipeline.collide(s)
                return solver.step(s, None, control, c, dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame

    def step(self):
        self.state = self._frame(self.state)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        bq = np.asarray(self.state.body_q)
        self.viewer.log_scalar("pile_height", float(bq[:, 2].max()))
        self.viewer.end_frame()

    def test_final(self):
        bq = np.asarray(self.state.body_q)
        assert np.isfinite(bq).all()
        # all rod segments settled into a low pile near the drop site
        assert bq[:, 2].max() < 0.5, f"pile too tall {bq[:, 2].max()}"
        assert bq[:, 2].min() > -0.05, "segment through the floor"
        # smooth capsules roll — allow drift but catch ejection
        assert np.abs(bq[:, :2]).max() < 4.0, "rod flew away"
