"""Differentiable soft body: optimize the launch velocity of a tetrahedral
FEM block so it hops onto a shelf (reference:
examples/diffsim/example_diffsim_soft_body.py — tape through the FEM
kernels; here ``jax.grad`` flows through the XPBD tet volume/edge
constraints and ground contact).
"""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD

TARGET = jnp.array([0.9, 0.0, 0.45])    # shelf-top landing point


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder(gravity=-9.81)
        b.add_soft_grid(pos=[-0.15, -0.15, 0.0], rot=None, vel=[0, 0, 0],
                        dim_x=3, dim_y=3, dim_z=3,
                        cell_x=0.1, cell_y=0.1, cell_z=0.1,
                        density=300.0, k_mu=2e3, k_lambda=2e4, k_damp=2.0,
                        radius=0.03)
        shelf = b.add_body(xform=[0.9, 0.0, 0.2, 0, 0, 0, 1],
                           kinematic=True, key="shelf")
        b.add_shape_box(shelf, hx=0.3, hy=0.4, hz=0.2)
        b.add_ground_plane()
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
                v0, s.particle_qd.shape).astype(s.particle_qd.dtype))

            def sub(s, _):
                c = pipeline.collide(s)
                return solver.step(s, None, control, c, dt), None
            return jax.lax.scan(sub, s, None, length=n_sub)[0]

        def loss(v0):
            final = rollout(v0)
            centroid = jnp.mean(final.particle_q, axis=0)
            return jnp.sum((centroid - TARGET) ** 2)

        self._loss_grad = jax.jit(jax.value_and_grad(loss))
        self._frame = jax.jit(
            lambda s: jax.lax.scan(
                lambda s, _: (solver.step(s, None, control,
                                          pipeline.collide(s), dt), None),
                s, None, length=self.substeps)[0])

        import optax
        v = jnp.array([1.5, 0.0, 2.0])
        opt = optax.adam(0.15)
        opt_state = opt.init(v)
        self.losses = []
        for _ in range(15):
            val, g = self._loss_grad(v)
            self.losses.append(float(val))
            updates, opt_state = opt.update(g, opt_state)
            v = optax.apply_updates(v, updates)
        self.v_opt = v
        s = self.model.state()
        self.state = s.replace(particle_qd=jnp.broadcast_to(
            v, s.particle_qd.shape).astype(s.particle_qd.dtype))

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


if __name__ == "__main__":
    from newton_tpu.examples import init, run
    viewer, args = init()
    run(Example(viewer, args), args)
