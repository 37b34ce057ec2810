"""Four-bar linkage closed by CONNECT constraints, solved with the Kamino
PADMM solver (reference: newton/examples kamino mechanism family)."""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.core.host_math import np_transform_inverse, np_transform_point
from newton_tpu.math import transform_point
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.solvers import SolverKamino


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        crank = b.add_body(xform=[0.0, 0, 0.5, 0, 0, 0, 1], key="crank")
        b.add_shape_capsule(crank, radius=0.04, half_height=0.25)
        b.add_joint_revolute(parent=-1, child=crank, axis="Y",
                             xform_c=[0, 0, -0.5, 0, 0, 0, 1])
        rocker = b.add_body(xform=[1.0, 0, 0.4, 0, 0, 0, 1], key="rocker")
        b.add_shape_capsule(rocker, radius=0.04, half_height=0.2)
        b.add_joint_revolute(parent=-1, child=rocker, axis="Y",
                             xform_p=[1.0, 0, 0, 0, 0, 0, 1],
                             xform_c=[0, 0, -0.4, 0, 0, 0, 1])
        coupler = b.add_body(xform=[0.5, 0, 0.9, 0, 0, 0, 1], key="coupler")
        b.add_shape_capsule(coupler, radius=0.04, half_height=0.45)
        b.add_joint_free(coupler)
        b.add_equality_constraint(nt.EqType.CONNECT, body1=crank,
                                  body2=coupler, anchor=(0.0, 0.0, 0.5))
        b.add_equality_constraint(nt.EqType.CONNECT, body1=rocker,
                                  body2=coupler, anchor=(0.0, 0.0, 0.4))
        self.model = b.finalize()
        self.solver = SolverKamino(self.model)
        qd0 = jnp.asarray(self.model.joint_qd0).at[0].set(2.0)  # kick crank
        self.state = eval_fk(self.model, self.model.joint_q0, qd0,
                             self.model.state())
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        solver, control, dt = self.solver, self.control, self.sim_dt

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, control, None, dt), None
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
        tip_c = transform_point(self.state.body_q[0],
                                jnp.asarray([0, 0, 0.5], dtype=jnp.float32))
        a2 = np_transform_point(
            np_transform_inverse(np.array([0.5, 0, 0.9, 0, 0, 0, 1.0])),
            np.array([0.0, 0.0, 1.0]))
        tip_k = transform_point(self.state.body_q[2],
                                jnp.asarray(a2, dtype=jnp.float32))
        drift = float(jnp.linalg.norm(tip_c - tip_k))
        assert drift < 2e-2, f"four-bar loop drift {drift}"
