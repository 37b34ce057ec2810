"""Convex hull stack colliding through the MPR narrow phase — no SDF
bakes (reference: newton/examples basic/selection stack family;
geometry/mpr.py)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.geometry.types import Mesh
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD


def _box_mesh(h):
    v = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                  for z in (-h, h)], np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5],
                  [0, 5, 1], [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4],
                  [1, 5, 7], [1, 7, 3]], np.int32)
    return Mesh(vertices=v, indices=f.reshape(-1))


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        mesh = _box_mesh(0.25)
        self.zs = [0.25, 0.76, 1.27]
        for z in self.zs:
            body = b.add_body(xform=[0, 0, z, 0, 0, 0, 1])
            b.add_shape_mesh(body, mesh=mesh)
            b.add_joint_free(body)
        b.add_ground_plane()
        b.approximate_meshes()          # MESH -> CONVEX hulls (MPR path)
        self.model = b.finalize()
        assert self.model.sdf_grids.shape[0] == 0   # the point of the demo
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=4)
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
        self.viewer.end_frame()

    def test_final(self):
        z = np.asarray(self.state.body_q)[:, 2]
        np.testing.assert_allclose(z, self.zs, atol=0.1)
