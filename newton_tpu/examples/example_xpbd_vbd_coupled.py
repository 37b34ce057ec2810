"""Two rigid solvers co-simulating one scene through a body partition
(reference: newton/examples/multiphysics/example_xpbd_vbd_coupled_solver.py
+ solver_coupled.py:327 Entry ownership): XPBD owns the odd boxes, the VBD
rigid-AVBD path the even ones; the mixed tower must settle like a
single-solver run — the staggered proxy-body exchange keeps both sides
agreeing at the shared contacts."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverCoupled, SolverVBD, SolverXPBD

N = 4
H = 0.08


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=-9.81)
        cfg = builder.default_shape_cfg.copy()
        cfg.mu = 0.7
        self.z0 = []
        for i in range(N):
            z = H + 2 * H * 1.01 * i
            bb = builder.add_body(xform=[0, 0, z, 0, 0, 0, 1],
                                  key=f"box_{i}")
            builder.add_shape_box(bb, hx=H, hy=H, hz=H, cfg=cfg)
            builder.add_joint_free(bb)
            self.z0.append(z)
        builder.add_ground_plane()
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model)
        part = np.arange(self.model.body_count) % 2 == 0
        self.solver = SolverCoupled(
            self.model,
            rigid_solver=SolverXPBD(self.model, iterations=8),
            second_rigid_solver=SolverVBD(self.model, iterations=8),
            body_partition=part, consensus_iters=2)
        self.state = self.model.state()
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

    def test_final(self):
        q = np.asarray(self.state.body_q)
        assert np.isfinite(q).all()
        for i, z in enumerate(self.z0):
            assert abs(q[i, 2] - z) < 0.05, (i, q[i, 2], z)
        upright = 1.0 - 2.0 * (q[:, 3] ** 2 + q[:, 4] ** 2)
        assert upright.min() > 0.95, upright.min()
