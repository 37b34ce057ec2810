"""Two worlds with the same robot but different obstacles — the padded
per-env contact plan keeps both colliding (reference: ragged multi-world
batching; generalized/solver.py heterogeneous plans)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverFeatherstone


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        for w in range(2):
            b.begin_world()
            b.add_articulation()
            body = b.add_body(xform=[0, 0, 1.0, 0, 0, 0, 1])
            b.add_shape_sphere(body, radius=0.3)
            b.add_joint_free(body)
            if w == 1:      # world 1 only: a static box pedestal
                b.add_shape_box(-1, xform=[0, 0, 0.2, 0, 0, 0, 1],
                                hx=0.5, hy=0.5, hz=0.2)
            b.end_world()
        b.add_ground_plane()
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverFeatherstone(self.model, contact_iterations=8)
        plan = self.solver.contact_plans[0]
        assert plan is not None and not plan.uniform   # padded plan active
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
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
        self.viewer.end_frame()

    def test_final(self):
        z = np.asarray(self.state.body_q)[:, 2]
        assert abs(z[0] - 0.3) < 0.05, z    # world 0: ground
        assert abs(z[1] - 0.7) < 0.05, z    # world 1: box top + radius
