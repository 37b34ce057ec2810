"""Differentiable simulation: optimize a ball's launch velocity so that,
after bouncing off the ground, it lands on a target (reference:
examples/diffsim/example_diffsim_ball.py — there with a hand-written tape;
here ``jax.grad`` differentiates straight through the jitted contact solve).
"""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD

TARGET = jnp.array([1.5, 0.0, 0.25])


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        body = b.add_body(xform=[0, 0, 0.6, 0, 0, 0, 1], key="ball")
        b.add_shape_sphere(body, radius=0.25,
                           cfg=nt.ShapeConfig(restitution=0.6))
        b.add_joint_free(body)
        b.add_ground_plane()
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=2,
                                 enable_restitution=True)
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.horizon = 40            # frames of simulated flight
        self.time = 0.0
        viewer.set_model(self.model)

        model, pipeline, solver, dt = (self.model, self.pipeline,
                                       self.solver, self.sim_dt)
        control = model.control()
        n_sub = self.horizon * self.substeps

        def rollout(v0):
            qd0 = model.joint_qd0.at[:3].set(v0)
            s = eval_fk(model, model.joint_q0, qd0, model.state())

            def sub(s, _):
                c = pipeline.collide(s)
                return solver.step(s, None, control, c, dt), None
            return jax.lax.scan(sub, s, None, length=n_sub)[0]

        def loss(v0):
            final = rollout(v0)
            return jnp.sum((final.body_q[0, :3] - TARGET) ** 2)

        self._loss_grad = jax.jit(jax.value_and_grad(loss))
        self._rollout_step = jax.jit(
            lambda s: jax.lax.scan(
                lambda s, _: (solver.step(s, None, control,
                                          pipeline.collide(s), dt), None),
                s, None, length=self.substeps)[0])

        # gradient descent on the launch velocity
        v = jnp.array([1.0, 0.0, 1.0])
        self.losses = []
        lr = 0.25
        for _ in range(12):
            val, g = self._loss_grad(v)
            self.losses.append(float(val))
            v = v - lr * g
        self.v_opt = v
        qd0 = self.model.joint_qd0.at[:3].set(v)
        self.state = eval_fk(self.model, self.model.joint_q0, qd0,
                             self.model.state())

    def step(self):
        self.state = self._rollout_step(self.state)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        assert len(self.losses) == 12
        assert self.losses[-1] < 0.25 * self.losses[0], self.losses
        assert np.isfinite(np.asarray(self.state.body_q)).all()


if __name__ == "__main__":
    from newton_tpu.examples import init, run
    viewer, args = init()
    run(Example(viewer, args), args)
