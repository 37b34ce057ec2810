"""Scalar logging: a bouncing ball's height and energy plotted through the
viewer's log_scalar channel (reference:
newton/examples/basic/example_basic_plotting.py)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers.solver_xpbd import SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=-9.81)
        cfg = builder.default_shape_cfg.copy()
        cfg.restitution = 0.8
        self.ball = builder.add_body(xform=[0, 0, 1.2, 0, 0, 0, 1],
                                     key="ball")
        builder.add_shape_sphere(self.ball, radius=0.15, cfg=cfg)
        builder.add_joint_free(self.ball)
        builder.add_ground_plane(cfg=cfg)
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=4)
        self.state = self.model.state()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        self.mass = float(np.asarray(self.model.body_mass)[self.ball])
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
        z = float(self.state.body_q[self.ball, 2])
        v = np.asarray(self.state.body_qd[self.ball, 0:3])
        e = self.mass * (9.81 * z + 0.5 * float(v @ v))
        self.viewer.log_scalar("ball/height", z)
        self.viewer.log_scalar("ball/energy", e)
        self.viewer.end_frame()

    def test_final(self):
        hs = self.viewer.scalars.get("ball/height", [])
        es = self.viewer.scalars.get("ball/energy", [])
        assert len(hs) > 0 and len(es) > 0
        assert np.isfinite(hs).all() and np.isfinite(es).all()
        # energy is non-increasing (restitution < 1) within tolerance
        assert es[-1] <= es[0] * 1.05
