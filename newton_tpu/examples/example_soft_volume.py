"""Deformable volume from a USD TetMesh prim dropping onto the ground
(reference: import_usd_deformable_volume examples)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD

_STAGE = """#usda 1.0
def TetMesh "Jelly" {
    point3f[] points = [(0,0,0.4), (0.3,0,0.4), (0,0.3,0.4), (0,0,0.7),
                        (0.3,0.3,0.7)]
    int[] tetVertexIndices = [0, 1, 2, 3, 4, 2, 1, 3]
    float physxDeformable:youngsModulus = 20000
}
"""


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        b.add_usd(_STAGE)
        b.add_ground_plane()
        self.model = b.finalize()
        assert self.model.particle_count == 5
        assert len(self.model.tet_indices) == 2
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
        q = np.asarray(self.state.particle_q)
        assert np.isfinite(q).all()
        assert (q[:, 2] > -0.05).all()      # rests on the floor, no tunnel
