"""The same box-drop scene stepped by three solvers side by side (XPBD,
generalized PGS, VBD rigid AVBD), rendered with per-world offsets — a
live solver-comparison overlay (reference:
newton/examples/basic/example_basic_multi_solver_overlay.py)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo, SolverVBD, SolverXPBD


def _scene():
    b = nt.ModelBuilder(gravity=-9.81)
    body = b.add_body(xform=[0, 0, 0.6, 0, 0, 0, 1], key="box")
    b.add_shape_box(body, hx=0.12, hy=0.12, hz=0.12)
    b.add_joint_free(body)
    b.add_ground_plane()
    return b.finalize()


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        self.model = _scene()
        self.pipeline = CollisionPipeline(self.model)
        self.solvers = [
            ("xpbd", SolverXPBD(self.model, iterations=4)),
            ("pgs", SolverMuJoCo(self.model, iterations=8, integrator="euler")),
            ("vbd", SolverVBD(self.model, iterations=6)),
        ]
        self.states = [self.model.state() for _ in self.solvers]
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        pipe, dt = self.pipeline, self.sim_dt
        self._frames = []
        for _, solver in self.solvers:
            def make(solver=solver):
                @jax.jit
                def frame(state):
                    def sub(s, _):
                        return solver.step(s, None, None,
                                           pipe.collide(s), dt), None
                    return jax.lax.scan(sub, state, None,
                                        length=self.substeps)[0]
                return frame
            self._frames.append(make())

    def step(self):
        self.states = [f(s) for f, s in zip(self._frames, self.states)]
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        # overlay: offset each solver's world along +y
        for k, s in enumerate(self.states):
            off = np.zeros_like(np.asarray(s.body_q))
            off[:, 1] = 0.5 * k
            self.viewer.log_state(s.replace(body_q=s.body_q + off))
        self.viewer.end_frame()

    def test_final(self):
        # all three solvers agree on the resting pose
        for (name, _), s in zip(self.solvers, self.states):
            q = np.asarray(s.body_q)
            assert np.isfinite(q).all(), name
            assert abs(q[0, 2] - 0.12) < 0.03, (name, q[0, 2])
