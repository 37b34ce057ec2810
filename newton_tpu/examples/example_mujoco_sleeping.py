"""Sleeping: boxes settle on the ground and are put to sleep by the
solver's quiescence counters; their state freezes exactly (reference:
examples/mujoco/example_mujoco_sleeping.py; mujoco SleepPolicy).

Runs the whole batch through the transposed fast path — sleeping rides the
lane axis as per-env masks.
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
        for i in range(3):
            body = b.add_body(xform=[i * 1.0, 0, 0.205 + 0.02 * i,
                                     0, 0, 0, 1], key=f"box{i}")
            b.add_shape_box(body, hx=0.2, hy=0.2, hz=0.2)
            b.add_joint_free(body)
        b.add_ground_plane()
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverFeatherstone(self.model, sleep_threshold=0.12,
                                         sleep_steps=8)
        state = eval_fk(self.model, self.model.joint_q0,
                        self.model.joint_qd0, self.model.state())
        self.state = self.solver.init_state(state)
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

    def asleep_count(self):
        n = 0
        for k, v in self.state.custom.items():
            if k.startswith("sleep:count:"):
                n += int((np.asarray(v) >= self.solver.sleep_steps).sum())
        return n

    def test_final(self):
        assert self.asleep_count() >= 1, "no articulation fell asleep"
        # frozen boxes sit at rest height with zero velocity
        qd = np.asarray(self.state.body_qd)
        assert np.abs(qd).max() < self.solver.sleep_threshold + 0.3
        z = np.asarray(self.state.body_q[:, 2])
        assert np.all(np.abs(z - 0.2) < 0.03), z
        assert np.isfinite(np.asarray(self.state.body_q)).all()


if __name__ == "__main__":
    from newton_tpu.examples import init, run
    viewer, args = init()
    run(Example(viewer, args), args)
