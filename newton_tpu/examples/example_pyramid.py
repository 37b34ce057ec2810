"""Box pyramid (3-2-1): a stack of boxes must stand under its own weight —
stacking stability is the classic stress test for contact-solver bias and
friction (reference: examples/contacts/example_pyramid.py).
"""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers.generalized.solver import SolverFeatherstone


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        h = 0.15
        cfg = nt.ShapeConfig(mu=0.8)
        rows = [3, 2, 1]
        self.top = None
        for r, n in enumerate(rows):
            x0 = -(n - 1) * h
            for i in range(n):
                body = b.add_body(
                    xform=[x0 + i * 2 * h, 0, h + r * 2 * h + 0.002 * r,
                           0, 0, 0, 1], key=f"box_{r}_{i}")
                b.add_shape_box(body, hx=h, hy=h, hz=h, cfg=cfg)
                b.add_joint_free(body)
                self.top = body
        b.add_ground_plane(cfg=cfg)
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverFeatherstone(self.model, contact_iterations=16)
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
        p = np.asarray(self.state.body_q[:, :3])
        assert np.isfinite(p).all()
        # top box still on the third level, roughly centered
        top = p[self.top]
        assert top[2] > 0.6, f"pyramid collapsed: top z={top[2]:.3f}"
        assert abs(top[0]) < 0.1 and abs(top[1]) < 0.1, top
        # nothing slid off the base footprint
        assert np.all(np.abs(p[:, :2]) < 0.8)


if __name__ == "__main__":
    from newton_tpu.examples import init, run
    viewer, args = init()
    run(Example(viewer, args), args)
