"""ArticulationView get/set + per-world selective reset
(reference: newton/examples/selection/ family; selection.py:1587-1673)."""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD
from newton_tpu.utils.selection import ArticulationView


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        worlds = getattr(args, "num_worlds", 4) if args else 4
        robot = nt.ModelBuilder()
        body = robot.add_body(xform=[0, 0, 1.0, 0, 0, 0, 1], key="ball")
        robot.add_shape_sphere(body, radius=0.3)
        robot.add_joint_free(body)
        builder = nt.ModelBuilder()
        builder.add_ground_plane()
        builder.replicate(robot, worlds)
        self.model = builder.finalize()
        self.view = ArticulationView(self.model, "*")
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=2)
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.control = self.model.control()
        self.sim_dt = 1.0 / 120.0
        self.substeps = 2
        self.time = 0.0
        self.frame_i = 0
        self.worlds = worlds
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
        self.frame_i += 1
        # every 30 frames, teleport half the worlds back up via the view
        if self.frame_i % 30 == 0:
            roots = self.view.get_root_transforms(self.state)
            mask = jnp.arange(self.worlds) % 2 == 0
            lifted = roots.at[:, 2].set(1.0)
            self.state = self.view.set_root_transforms(self.state, lifted,
                                                       mask=mask)
            self.state = self.view.eval_fk(self.state)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        roots = np.asarray(self.view.get_root_transforms(self.state))
        assert np.isfinite(roots).all()
        assert (roots[:, 2] > 0.1).all()
