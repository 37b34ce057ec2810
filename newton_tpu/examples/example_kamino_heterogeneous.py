"""Heterogeneous worlds under the Kamino PADMM solver: world 0 holds a
double pendulum, world 1 a loop-closed four-bar — different entity counts,
one flat model, one solve (reference:
newton/examples/kamino/example_kamino_basic_heterogeneous.py)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.solvers import SolverKamino


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder(gravity=-9.81)

        # world 0: double pendulum
        b.begin_world()
        l1 = b.add_body(xform=[0.0, 0, 1.5, 0, 0, 0, 1], key="w0_l1")
        b.add_shape_capsule(l1, radius=0.04, half_height=0.25)
        b.add_joint_revolute(parent=-1, child=l1, axis="Y",
                             xform_p=[0, 0, 2.0, 0, 0, 0, 1],
                             xform_c=[0, 0, 0.5, 0, 0, 0, 1], key="w0_j1")
        l2 = b.add_body(xform=[0.0, 0, 0.5, 0, 0, 0, 1], key="w0_l2")
        b.add_shape_capsule(l2, radius=0.04, half_height=0.25)
        b.add_joint_revolute(parent=l1, child=l2, axis="Y",
                             xform_p=[0, 0, -0.5, 0, 0, 0, 1],
                             xform_c=[0, 0, 0.5, 0, 0, 0, 1], key="w0_j2")
        b.end_world()

        # world 1: four-bar with a CONNECT loop closure
        b.begin_world()
        crank = b.add_body(xform=[0.0, 2.0, 0.5, 0, 0, 0, 1], key="w1_crank")
        b.add_shape_capsule(crank, radius=0.04, half_height=0.25)
        b.add_joint_revolute(parent=-1, child=crank, axis="Y",
                             xform_p=[0, 2.0, 0, 0, 0, 0, 1],
                             xform_c=[0, 0, -0.5, 0, 0, 0, 1], key="w1_j1")
        rocker = b.add_body(xform=[1.0, 2.0, 0.4, 0, 0, 0, 1],
                            key="w1_rocker")
        b.add_shape_capsule(rocker, radius=0.04, half_height=0.2)
        b.add_joint_revolute(parent=-1, child=rocker, axis="Y",
                             xform_p=[1.0, 2.0, 0, 0, 0, 0, 1],
                             xform_c=[0, 0, -0.4, 0, 0, 0, 1], key="w1_j2")
        coupler = b.add_body(xform=[0.5, 2.0, 0.9, 0, 0, 0, 1],
                             key="w1_coupler")
        b.add_shape_capsule(coupler, radius=0.04, half_height=0.45)
        b.add_joint_free(coupler)
        b.add_equality_constraint(nt.EqType.CONNECT, body1=crank,
                                  body2=coupler, anchor=(0.0, 0.0, 0.5))
        b.add_equality_constraint(nt.EqType.CONNECT, body1=rocker,
                                  body2=coupler, anchor=(0.0, 0.0, 0.4))
        b.end_world()

        self.bodies = dict(l1=l1, l2=l2, crank=crank, coupler=coupler)
        self.model = b.finalize()
        self.solver = SolverKamino(self.model)
        q0 = np.asarray(self.model.joint_q0).copy()
        q0[0] = 0.8  # tilt the pendulum
        qd0 = np.asarray(self.model.joint_qd0).copy()
        qd0[2] = 2.0  # kick the crank
        self.state = eval_fk(self.model, np.asarray(q0), np.asarray(qd0),
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
        q = np.asarray(self.state.body_q)
        jq = np.asarray(self.state.joint_q)
        assert np.isfinite(q).all() and np.isfinite(jq).all()
        # pendulum swung from its tilt
        assert abs(jq[0] - 0.8) > 0.02
        # four-bar loop stayed closed: coupler end tracks the crank tip
        from newton_tpu.math import transform_point
        import jax.numpy as jnp
        tip = transform_point(self.state.body_q[self.bodies["crank"]],
                              jnp.asarray([0.0, 0.0, 0.5]))
        end = transform_point(self.state.body_q[self.bodies["coupler"]],
                              jnp.asarray([0.0, 0.0, 0.5]))
        # world-1 bodies stayed in their own world (no cross-world contact)
        assert abs(float(q[self.bodies["crank"], 1]) - 2.0) < 0.3
        assert float(jnp.linalg.norm(tip - end)) < 1.2
