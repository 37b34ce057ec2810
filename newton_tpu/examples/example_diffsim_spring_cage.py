"""Differentiable spring cage: a particle suspended by 8 springs; optimize
the spring rest lengths by gradient descent so the particle settles on a
target point (reference: examples/diffsim/example_diffsim_spring_cage.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.solvers import SolverXPBD

TARGET = jnp.array([0.15, 0.1, 0.55])


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder(gravity=-2.0)
        # cage corners (pinned) + center particle (dynamic)
        corners = []
        for sx in (-1, 1):
            for sy in (-1, 1):
                for sz in (0, 1):
                    corners.append(b.add_particle(
                        (0.5 * sx, 0.5 * sy, 0.1 + 0.9 * sz), mass=0.0))
        self.center = b.add_particle((0.0, 0.0, 0.5), mass=1.0)
        self.n_springs = len(corners)
        for c in corners:
            b.add_spring(c, self.center, ke=30.0, kd=1.5)
        self.model = b.finalize()
        self.solver = SolverXPBD(self.model, iterations=4)
        self.sim_dt = 1.0 / 120.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        model, solver, dt = self.model, self.solver, self.sim_dt
        control = model.control()
        n_sub = 30 * self.substeps

        def rollout(rest):
            m = model.replace(spring_rest_length=rest)
            s = m.state()

            def sub(s, _):
                return solver.step(s, None, control, None, dt,
                                   model=m), None
            return jax.lax.scan(sub, s, None, length=n_sub)[0]

        def loss(rest):
            final = rollout(rest)
            return jnp.sum((final.particle_q[self.center] - TARGET) ** 2)

        self._loss_grad = jax.jit(jax.value_and_grad(loss))

        rest = jnp.asarray(self.model.spring_rest_length)
        self.losses = []
        lr = 0.6
        for _ in range(10):
            val, g = self._loss_grad(rest)
            self.losses.append(float(val))
            rest = jnp.clip(rest - lr * g, 0.05, 2.0)
        self.rest_opt = rest
        self.opt_model = self.model.replace(spring_rest_length=rest)
        self.state = self.opt_model.state()

        @jax.jit
        def frame(s):
            def sub(s, _):
                return solver.step(s, None, control, None, dt,
                                   model=self.opt_model), None
            return jax.lax.scan(sub, s, None, length=self.substeps)[0]

        self._frame = frame

    def step(self):
        self.state = self._frame(self.state)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        assert self.losses[-1] < 0.3 * self.losses[0], self.losses
        assert np.isfinite(np.asarray(self.state.particle_q)).all()


if __name__ == "__main__":
    from newton_tpu.examples import init, run
    viewer, args = init()
    run(Example(viewer, args), args)
