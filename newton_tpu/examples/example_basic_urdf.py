"""URDF import: a double pendulum authored as an inline URDF string swings
under gravity with the generalized solver (reference:
newton/examples/basic/example_basic_urdf.py)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.solvers.generalized.solver import SolverFeatherstone

URDF = """<?xml version="1.0"?>
<robot name="double_pendulum">
  <link name="base">
    <inertial><mass value="0"/><inertia ixx="0" iyy="0" izz="0"
      ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <link name="upper">
    <inertial>
      <origin xyz="0 0 -0.25"/>
      <mass value="1.0"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.001" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision>
      <origin xyz="0 0 -0.25"/>
      <geometry><cylinder radius="0.03" length="0.5"/></geometry>
    </collision>
  </link>
  <link name="lower">
    <inertial>
      <origin xyz="0 0 -0.25"/>
      <mass value="1.0"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.001" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision>
      <origin xyz="0 0 -0.25"/>
      <geometry><cylinder radius="0.03" length="0.5"/></geometry>
    </collision>
  </link>
  <joint name="shoulder" type="revolute">
    <parent link="base"/>
    <child link="upper"/>
    <origin xyz="0 0 1.2"/>
    <axis xyz="0 1 0"/>
    <limit lower="-3.14" upper="3.14" effort="50" velocity="10"/>
  </joint>
  <joint name="elbow" type="revolute">
    <parent link="upper"/>
    <child link="lower"/>
    <origin xyz="0 0 -0.5"/>
    <axis xyz="0 1 0"/>
    <limit lower="-3.14" upper="3.14" effort="50" velocity="10"/>
  </joint>
</robot>
"""


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=-9.81)
        builder.add_urdf(URDF)
        self.model = builder.finalize()
        self.solver = SolverFeatherstone(self.model)
        # start horizontal so it swings
        q0 = np.asarray(self.model.joint_q0).copy()
        q0[0] = np.pi / 2
        self.state = eval_fk(self.model, np.asarray(q0),
                             self.model.joint_qd0, self.model.state())
        self.control = self.model.control()
        self.sim_dt = 1.0 / 480.0
        self.substeps = 8
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
        # swinging: the shoulder has left its initial angle, and the
        # assembly stays below/near its anchor at 1.2 m
        assert abs(jq[0] - np.pi / 2) > 0.01
        assert q[:, 2].max() < 1.3
