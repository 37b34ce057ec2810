"""Tiled camera sensor rendering a falling sphere
(reference: newton/examples/sensors/ tiled camera examples)."""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sensors import SensorTiledCamera
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder()
        body = builder.add_body(xform=[0, 0, 1.0, 0, 0, 0, 1], key="ball")
        builder.add_shape_sphere(body, radius=0.5)
        builder.add_joint_free(body)
        builder.add_ground_plane()
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=2)
        self.camera = SensorTiledCamera(self.model, width=32, height=32)
        self.state = self.model.state()
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        # camera 3m back on +Y looking at the origin (camera looks along -Z,
        # +Y up): rotate -Z onto -Y
        import newton_tpu.math as nm
        q = nm.quat_from_axis_angle(jnp.array([1.0, 0, 0]), jnp.pi / 2)
        self.cam_xform = jnp.concatenate(
            [jnp.array([0.0, -3.0, 0.7]), q])[None]
        self.images = None
        viewer.set_model(self.model)

        pipeline, solver, control, dt = (self.pipeline, self.solver,
                                         self.control, self.sim_dt)
        camera, cam_xform = self.camera, self.cam_xform

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, control, pipeline.collide(s),
                                   dt), None
            state = jax.lax.scan(sub, state, None, length=self.substeps)[0]
            images = camera.render(state, cam_xform)
            return state, images

        self._frame = frame

    def step(self):
        self.state, self.images = self._frame(self.state)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.log_image("camera/depth", np.asarray(self.images["depth"][0]))
        self.viewer.end_frame()

    def test_final(self):
        depth = np.asarray(self.images["depth"][0])
        shape_idx = np.asarray(self.images["shape_index"][0])
        assert np.isfinite(depth).all()
        # the sphere must be visible somewhere in the frame
        assert (shape_idx == 0).any(), "sphere not visible"
        assert (shape_idx == 1).any(), "ground not visible"
