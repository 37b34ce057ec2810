"""Two-segment finger flexed by a spatial tendon routed over cylinder wrap
geoms at each knuckle — the biomechanical tendon-routing workload
(reference: MJCF <spatial> tendons with wrap geoms, imported via the wrap
arrays at newton/_src/utils/import_mjcf.py:2865-2868). The tendon length,
wrap routing and moment arms are evaluated exactly inside the jitted step
(newton_tpu/sim/tendon.py); a single muscle-style pull force curls both
joints with knuckle-radius moment arms, and the passive tendon spring
re-extends the finger when the pull releases.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.solvers import SolverMuJoCo

FINGER_MJCF = """
<mujoco model="finger">
  <option gravity="0 0 -9.81" timestep="0.004"/>
  <worldbody>
    <site name="origin" pos="-0.02 0 -0.02"/>
    <body name="proximal" pos="0 0 0">
      <joint name="mcp" type="hinge" axis="0 1 0" range="-5 95"
             damping="0.05"/>
      <geom name="pseg" type="capsule" fromto="0 0 0 0.05 0 0" size="0.009"/>
      <geom name="pwrap" type="cylinder" pos="0.0 0 -0.012" zaxis="0 1 0"
            size="0.008 0.012" contype="0" conaffinity="0"/>
      <site name="pal" pos="0.025 0 -0.011"/>
      <body name="distal" pos="0.05 0 0">
        <joint name="pip" type="hinge" axis="0 1 0" range="-5 110"
               damping="0.05"/>
        <geom name="dseg" type="capsule" fromto="0 0 0 0.04 0 0"
              size="0.008"/>
        <geom name="dwrap" type="cylinder" pos="0.0 0 -0.011" zaxis="0 1 0"
              size="0.007 0.011" contype="0" conaffinity="0"/>
        <site name="tip" pos="0.035 0 -0.009"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <spatial name="flexor" stiffness="45" damping="0.3">
      <site site="origin"/>
      <geom geom="pwrap"/>
      <site site="pal"/>
      <geom geom="dwrap"/>
      <site site="tip"/>
    </spatial>
  </tendon>
  <actuator>
    <motor name="pull" tendon="flexor" gear="1" ctrlrange="-8 0"
           ctrllimited="true"/>
  </actuator>
</mujoco>
"""


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        path = os.path.join(tempfile.mkdtemp(), "finger.xml")
        with open(path, "w") as f:
            f.write(FINGER_MJCF)
        b = nt.ModelBuilder()
        b.gravity = (0.0, 0.0, -9.81)
        b.add_mjcf(path)
        self.model = b.finalize()
        self.solver = SolverMuJoCo(self.model, iterations=8)
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        solver, dt = self.solver, self.sim_dt
        base_control = self.control

        @jax.jit
        def frame(state, t):
            # pull for the first 1.5 s, release after (passive spring
            # re-extends the finger)
            pull = jnp.where(t < 1.5, -6.0, 0.0)
            control = base_control.replace(
                custom=dict(base_control.custom,
                            **{"mjc:ctrl": pull[None]}))

            def sub(s, _):
                return solver.step(s, None, control, None, dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame

    def step(self):
        self.state = self._frame(self.state, jnp.float32(self.time))
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        q = np.asarray(self.state.joint_q)
        assert np.isfinite(q).all(), "non-finite finger coordinates"
        # after release the passive spring should have re-extended the
        # finger most of the way back toward the build pose
        if self.time > 2.5:
            assert np.abs(q).max() < 1.0, f"finger failed to re-extend: {q}"


if __name__ == "__main__":
    from . import run
    run(Example)
