"""Cloth twist: a strip pinned at both ends; the right-edge pins rotate
about the strip axis each frame, wringing the cloth (reference:
examples/cloth/example_cloth_twist.py). Self-collision keeps the folds
from passing through each other.
"""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.solvers import SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder(gravity=-2.0)
        self.dim_x, self.dim_y = 16, 6
        self.parts = b.add_cloth_grid(
            pos=(0.0, -0.15, 1.0), rot=None, vel=(0, 0, 0),
            dim_x=self.dim_x, dim_y=self.dim_y,
            cell_x=0.05, cell_y=0.05, mass=0.3,
            fix_left=True, fix_right=True, radius=0.012,
            tri_ke=500.0, tri_ka=500.0, tri_kd=5.0, edge_ke=2.0)
        self.model = b.finalize()
        self.solver = SolverXPBD(self.model, iterations=6,
                                 enable_particle_particle=True)
        self.state = self.model.state()
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        self.angle = 0.0
        viewer.set_model(self.model)

        nx, ny = self.dim_x + 1, self.dim_y + 1
        idx = np.arange(nx * ny).reshape(ny, nx)
        self.right = jnp.asarray(idx[:, -1])            # pinned column
        # rotation center of the right edge (strip axis = x)
        p0 = np.asarray(self.model.particle_q)
        self.right_rest = jnp.asarray(p0[np.asarray(self.right)])
        self.center = jnp.asarray(p0[np.asarray(self.right)].mean(axis=0))

        solver, control, dt = self.solver, self.control, self.sim_dt

        @jax.jit
        def frame(state, angle):
            # kinematically rotate the pinned right edge about x
            c, s = jnp.cos(angle), jnp.sin(angle)
            rel = self.right_rest - self.center
            rot = jnp.stack([rel[:, 0],
                             c * rel[:, 1] - s * rel[:, 2],
                             s * rel[:, 1] + c * rel[:, 2]], axis=1)
            q = state.particle_q.at[self.right].set(self.center + rot)
            state = state.replace(particle_q=q)

            def sub(s_, _):
                return solver.step(s_, None, control, None, dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame

    def step(self):
        self.angle += 0.06
        self.state = self._frame(self.state, self.angle)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        q = np.asarray(self.state.particle_q)
        assert np.isfinite(q).all()
        # the mid column has been dragged toward the axis by the twist
        nx, ny = self.dim_x + 1, self.dim_y + 1
        idx = np.arange(nx * ny).reshape(ny, nx)
        mid = q[idx[:, nx // 2]]
        width0 = 0.05 * self.dim_y
        spread = mid[:, 1].max() - mid[:, 1].min()
        assert spread < width0 * 0.98, f"no contraction: {spread}"
        # no particle has been flung away
        assert np.linalg.norm(q, axis=1).max() < 3.0


if __name__ == "__main__":
    from newton_tpu.examples import init, run
    viewer, args = init()
    run(Example(viewer, args), args)
