"""AVBD rigid-rigid contact (reference:
newton/examples/vbd/example_vbd_rigid_rigid_contact.py): two boxes dropped
onto each other under the VBD solver's rigid AVBD extension
(rigid_vbd_kernels.py:83) — augmented 6x6 block descent with penalty
contact stiffness; the pair must land, stack, and come to rest."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverVBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=-9.81)
        cfg = builder.default_shape_cfg.copy()
        cfg.mu = 0.6
        self.zs = []
        for i, z in enumerate((0.15, 0.6)):
            bb = builder.add_body(
                xform=[0.02 * i, 0.0, z, 0, 0, 0, 1], key=f"box_{i}")
            builder.add_shape_box(bb, hx=0.12, hy=0.12, hz=0.12, cfg=cfg)
            builder.add_joint_free(bb)
        builder.add_ground_plane()
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model,
                                          persistent_manifolds=True)
        self.solver = SolverVBD(self.model, iterations=8)
        self.state = self.model.state()
        self.contacts = self.pipeline.contacts()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        solver, pipe, dt = self.solver, self.pipeline, self.sim_dt

        @jax.jit
        def frame(state, contacts):
            def sub(carry, _):
                s, c = carry
                c = pipe.collide(s, prev=c)
                return (solver.step(s, None, None, c, dt), c), None
            return jax.lax.scan(sub, (state, contacts), None,
                                length=self.substeps)[0]

        self._frame = frame

    def step(self):
        self.state, self.contacts = self._frame(self.state, self.contacts)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        q = np.asarray(self.state.body_q)
        qd = np.asarray(self.state.body_qd)
        assert np.isfinite(q).all()
        # lower box on the ground, upper box stacked on it
        assert abs(q[0, 2] - 0.12) < 0.05, q[0, 2]
        assert abs(q[1, 2] - 0.36) < 0.09, q[1, 2]
        assert np.abs(qd[:, :3]).max() < 0.5, qd
