"""Domino chain along a spiral arc: the first domino is nudged and the
topple propagates to the last (reference:
newton/examples/contacts/example_domino_spiral.py)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.builder import np_transform
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers.solver_xpbd import SolverXPBD

N_DOMINO = 10
H = 0.30  # domino height


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=-9.81)
        cfg = builder.default_shape_cfg.copy()
        cfg.mu = 0.6

        # spiral arc: radius grows gently with angle; spacing ~0.55 H so
        # each falling domino reaches the next
        self.dominoes = []
        theta = 0.0
        r = 1.0
        for i in range(N_DOMINO):
            c, s = np.cos(theta), np.sin(theta)
            pos = np.array([r * c, r * s, H / 2])
            # domino face normal points along the tangent (-sin, cos)
            q = np.array([0.0, 0.0, np.sin(theta / 2), np.cos(theta / 2)])
            bb = builder.add_body(xform=np_transform(pos, q),
                                  key=f"domino_{i}")
            builder.add_shape_box(bb, hx=0.02, hy=0.09, hz=H / 2, cfg=cfg,
                                  key=f"domino_shape_{i}")
            builder.add_joint_free(bb, key=f"domino_free_{i}")
            self.dominoes.append(bb)
            dtheta = 0.55 * H / r
            theta += dtheta
            r += 0.02
        builder.add_ground_plane()
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=4)
        state = self.model.state()
        # nudge the first domino toward the second (tangential spin)
        qd = np.asarray(state.body_qd).copy()
        qd[self.dominoes[0], 3:6] = [0.0, 0.0, 0.0]
        qd[self.dominoes[0], 0:3] = [0.0, 1.4, 0.0]  # tangent at theta=0
        self.state = state.replace(body_qd=np.asarray(qd))
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
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

    def _up_z(self, q):
        # z-component of the body z-axis in world frame
        x, y = q[0], q[1]
        return 1.0 - 2.0 * (x * x + y * y)

    def test_final(self):
        q = np.asarray(self.state.body_q)
        assert np.isfinite(q).all()
        tipped = [self._up_z(q[d, 3:7]) < 0.75 for d in self.dominoes]
        # the chain propagated through at least the first half
        assert all(tipped[: N_DOMINO // 2]), tipped
