"""Dzhanibekov effect (intermediate-axis theorem): a free rigid body spun
about its middle principal axis periodically flips, while angular momentum
stays conserved (reference: examples/basic/example_basic_dzhanibekov.py).

The gyroscopic bias forces of the generalized solver drive the instability;
no gravity, no contacts — pure free-body dynamics.
"""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.solvers.generalized.solver import SolverFeatherstone


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=0.0)
        # T-handle: principal inertias I_x < I_y < I_z; spin about y
        body = builder.add_body(
            xform=[0, 0, 1.0, 0, 0, 0, 1], mass=1.0,
            I_m=np.diag([0.02, 0.10, 0.12]), key="handle",
            qd=[0, 0, 0, 0.05, 12.0, 0.0])
        builder.add_shape_box(body, hx=0.3, hy=0.05, hz=0.05,
                              cfg=nt.ShapeConfig(density=0.0))
        builder.add_joint_free(body)
        self.model = builder.finalize()
        self.solver = SolverFeatherstone(self.model)
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.control = self.model.control()
        self.sim_dt = 1.0 / 480.0
        self.substeps = 8
        self.time = 0.0
        viewer.set_model(self.model)
        self.L0 = self._angular_momentum()

        solver, control, dt = self.solver, self.control, self.sim_dt

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, control, None, dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame

    def _angular_momentum(self):
        q = np.asarray(self.state.body_q[0, 3:7])
        w = np.asarray(self.state.body_qd[0, 3:6])
        R = _quat_to_mat(q)
        I_w = R @ np.diag([0.02, 0.10, 0.12]) @ R.T
        return I_w @ w

    def step(self):
        self.state = self._frame(self.state)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        L = self._angular_momentum()
        # world-frame angular momentum conserved through the instability
        drift = np.linalg.norm(L - self.L0) / np.linalg.norm(self.L0)
        assert drift < 0.05, f"angular momentum drift {drift:.3f}"
        # the spin axis precesses: body angular velocity has left pure-y
        w = np.asarray(self.state.body_qd[0, 3:6])
        assert abs(w[0]) + abs(w[2]) > 0.05, f"no precession: {w}"
        assert np.isfinite(np.asarray(self.state.body_q)).all()


def _quat_to_mat(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


if __name__ == "__main__":
    from newton_tpu.examples import init, run
    viewer, args = init()
    run(Example(viewer, args), args)
