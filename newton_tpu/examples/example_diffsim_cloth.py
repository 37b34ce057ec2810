"""Differentiable cloth: optimize the launch velocity of a cloth patch so
its draped centroid lands on a floor target (reference:
examples/diffsim/example_diffsim_cloth.py — wp.Tape through the cloth
kernels; here ``jax.grad`` differentiates through the XPBD triangle/bending
constraints AND the particle-ground contact with friction).
"""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD

TARGET = jnp.array([1.1, 0.0])      # floor landing spot (x, y)


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder(gravity=-9.81)
        b.add_cloth_grid(pos=[-0.2, -0.2, 0.6], dim_x=5, dim_y=5,
                         cell_x=0.08, cell_y=0.08, mass=0.2, radius=0.02,
                         tri_ke=200.0, tri_ka=200.0, tri_kd=5.0,
                         edge_ke=0.2)
        b.add_ground_plane(cfg=nt.ShapeConfig(mu=0.4))
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=4)
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.horizon = 45
        self.time = 0.0
        viewer.set_model(self.model)

        model, pipeline, solver, dt = (self.model, self.pipeline,
                                       self.solver, self.sim_dt)
        control = model.control()
        n_sub = self.horizon * self.substeps

        def rollout(v0):
            s = model.state()
            s = s.replace(particle_qd=jnp.broadcast_to(
                jnp.concatenate([v0, jnp.zeros(1)]),
                s.particle_qd.shape).astype(s.particle_qd.dtype))

            def sub(s, _):
                c = pipeline.collide(s)
                return solver.step(s, None, control, c, dt), None
            return jax.lax.scan(sub, s, None, length=n_sub)[0]

        def loss(v0):
            final = rollout(v0)
            centroid = jnp.mean(final.particle_q[:, :2], axis=0)
            return jnp.sum((centroid - TARGET) ** 2)

        self._loss_grad = jax.jit(jax.value_and_grad(loss))
        self._frame = jax.jit(
            lambda s: jax.lax.scan(
                lambda s, _: (solver.step(s, None, control,
                                          pipeline.collide(s), dt), None),
                s, None, length=self.substeps)[0])

        v = jnp.array([0.5, 0.3])
        self.losses = []
        lr = 0.8
        for _ in range(10):
            val, g = self._loss_grad(v)
            self.losses.append(float(val))
            v = v - lr * g
        self.v_opt = v
        s = self.model.state()
        self.state = s.replace(particle_qd=jnp.broadcast_to(
            jnp.concatenate([v, jnp.zeros(1)]),
            s.particle_qd.shape).astype(s.particle_qd.dtype))

    def step(self):
        self.state = self._frame(self.state)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        assert np.isfinite(np.asarray(self.state.particle_q)).all()
        assert self.losses[-1] < 0.3 * self.losses[0], self.losses
        assert self.losses[-1] < 0.02, self.losses


if __name__ == "__main__":
    from newton_tpu.examples import init, run
    viewer, args = init()
    run(Example(viewer, args), args)
