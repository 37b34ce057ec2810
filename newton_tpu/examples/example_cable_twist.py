"""Torsion wave down a clamped cable (reference:
newton/examples/cable/example_cable_twist.py — same scenario on Warp
kernels): a straight Cosserat cable clamped at the root gets a constant
axial torque at its free tip; twist propagates down the rod against the
split twist stiffness and settles at the analytic uniform-twist profile
tau = k_twist * dtheta/ds."""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.solvers.solver_xpbd import SolverXPBD

SEGS = 10
TWIST_KE = 2.0
TIP_TORQUE = 0.4


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=0.0)
        self.bodies = builder.add_rod(
            [0.0, 0.0, 1.0], [1.0, 0.0, 1.0], segments=SEGS, radius=0.02,
            joint="cable", bend_ke=50.0, bend_kd=0.5,
            twist_ke=TWIST_KE, twist_kd=0.05,
            stretch_ke=2.0e4, stretch_kd=1.0, root_joint="fixed",
            key="cable")
        self.model = builder.finalize()
        self.solver = SolverXPBD(self.model, iterations=8)
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.sim_dt = 1.0 / 960.0
        self.substeps = 8
        self.time = 0.0
        viewer.set_model(self.model)

        solver, dt = self.solver, self.sim_dt
        tip = self.bodies[-1]
        # constant world-frame axial torque on the tip segment (the rod lies
        # along +x; the body_f wrench is [f, tau] at the COM)
        wrench = jnp.zeros((self.model.body_count, 6))
        wrench = wrench.at[tip, 3].set(TIP_TORQUE)

        @jax.jit
        def frame(state):
            def sub(s, _):
                s = s.replace(body_f=wrench.astype(s.body_f.dtype))
                return solver.step(s, None, None, None, dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame

    def _twist_angles(self):
        """Roll of each segment about the rod axis (+x), relative to root."""
        q = np.asarray(self.state.body_q)[:, 3:7]
        # local +y of each segment mapped to world, projected on the y-z
        # plane: its angle around x is the accumulated twist
        x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        ey_y = 1.0 - 2.0 * (x * x + z * z)
        ey_z = 2.0 * (y * z + x * w)
        return np.unwrap(np.arctan2(ey_z, ey_y))

    def step(self):
        self.state = self._frame(self.state)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        q = np.asarray(self.state.body_q)
        assert np.isfinite(q).all()
        # rod stays straight on the x-axis (pure torsion, no buckling here)
        assert np.abs(q[:, 1:3] - np.array([0.0, 1.0])).max() < 0.05
        theta = self._twist_angles()
        # tip wound up by a finite twist, monotonically increasing root->tip
        assert theta[-1] > 0.3, theta
        dtheta = np.diff(theta)
        assert (dtheta > -1e-3).all(), dtheta
        # near-uniform twist rate at equilibrium (constant torque along rod)
        mid = dtheta[2:-2]
        if mid.size and theta[-1] > 0.5:
            assert mid.std() < 0.5 * (abs(mid.mean()) + 1e-6), mid
