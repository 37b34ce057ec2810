"""Author a physics stage, write it as BINARY usdc, import it back and
simulate (reference: newton USD import examples; usd/usdc.py crate codec)."""

import os
import tempfile

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD
from newton_tpu.usd.usdc import write_usdc
from newton_tpu.utils.usda_parser import parse_usda

_STAGE = """#usda 1.0
def Xform "World" {
    def Xform "Ball" (prepend apiSchemas = ["PhysicsRigidBodyAPI"]) {
        double3 xformOp:translate = (0, 0, 1.2)
        def Sphere "Col" (prepend apiSchemas = ["PhysicsCollisionAPI"]) {
            double radius = 0.3
        }
    }
    def Xform "Crate" (prepend apiSchemas = ["PhysicsRigidBodyAPI"]) {
        double3 xformOp:translate = (0.0, 0.0, 0.25)
        def Cube "Col" (prepend apiSchemas = ["PhysicsCollisionAPI"]) {
            double size = 0.5
        }
    }
}
"""


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        path = os.path.join(tempfile.gettempdir(), "newton_tpu_demo.usdc")
        write_usdc(parse_usda(_STAGE), path)

        b = nt.ModelBuilder()
        b.add_usd(path)                 # binary crate import, no pxr
        b.add_ground_plane()
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=2)
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
        assert np.isfinite(z).all()
        # the ball lands on the crate: ball center ~ crate top + radius
        assert z[0] > z[1], z
