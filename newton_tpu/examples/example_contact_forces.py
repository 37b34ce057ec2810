"""Contact-force sensing via step_with_contacts — forces come from the
solve that already ran, no second solve (reference: SensorContact +
solver.update_contacts flow; prefer step_with_contacts)."""

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
        body = b.add_body(xform=[0, 0, 0.3, 0, 0, 0, 1], key="crate")
        b.add_shape_box(body, hx=0.3, hy=0.3, hz=0.3,
                        cfg=nt.ShapeConfig(density=1000.0))
        b.add_joint_free(body)
        b.add_ground_plane()
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverFeatherstone(self.model, contact_iterations=8)
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.time = 0.0
        self.normal_force = 0.0
        viewer.set_model(self.model)

        pipeline, solver, control, dt = (self.pipeline, self.solver,
                                         self.control, self.sim_dt)

        @jax.jit
        def frame(state):
            c = pipeline.collide(state)
            out, c2 = solver.step_with_contacts(state, None, control, c, dt)
            return out, c2.rigid_contact_force, c2.rigid_contact_mask

        self._frame = frame

    def step(self):
        self.state, force, mask = self._frame(self.state)
        f = np.asarray(force)
        m = np.asarray(mask)
        self.normal_force = float(np.abs(f[m]).sum()) if m.any() else 0.0
        self.viewer.log_scalar("contact/total_force", self.normal_force)
        self.time += self.sim_dt

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        # at rest the reported normal force supports the crate's weight
        weight = float(np.asarray(self.model.body_mass)[0]) * 9.81
        assert self.normal_force > 0.2 * weight, \
            (self.normal_force, weight)
