"""Mesh-on-mesh stacking via baked SDF contacts with the hydroelastic
equal-pressure contact mode (reference: sdf_contact.py / sdf_hydroelastic.py
mesh collision examples)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers.generalized.solver import SolverFeatherstone


def _box_mesh(h):
    v = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                  for z in (-h, h)])
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5],
                  [0, 5, 1], [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4],
                  [1, 5, 7], [1, 7, 3]])
    return nt.Mesh(v.astype(np.float64), f.reshape(-1), is_solid=True)


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder()
        for i, (x, z) in enumerate(((0.0, 0.5), (0.1, 1.52), (-0.05, 2.54))):
            body = builder.add_body(xform=[x, 0, z, 0, 0, 0, 1],
                                    key=f"crate_{i}")
            builder.add_shape_mesh(body, mesh=_box_mesh(0.5))
            builder.add_joint_free(body)
        builder.add_ground_plane()
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model, hydroelastic=True)
        self.solver = SolverFeatherstone(self.model, contact_iterations=8)
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
                return solver.step(s, None, control, pipeline.collide(s),
                                   dt), None
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
        zs = sorted(q[:, 2])
        assert abs(zs[0] - 0.5) < 0.06 and abs(zs[1] - 1.5) < 0.1 \
            and abs(zs[2] - 2.5) < 0.15, zs
