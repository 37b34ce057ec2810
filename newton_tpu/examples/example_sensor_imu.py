"""IMU + frame-transform sensors on a swinging pendulum (reference:
newton/examples sensor family)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sensors.sensor_frame_transform import SensorFrameTransform
from newton_tpu.sensors.sensor_imu import SensorIMU
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.solvers import SolverFeatherstone


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        rod = b.add_body(xform=[0.5, 0, 0, 0, 0, 0, 1], key="rod")
        b.add_shape_capsule(rod, radius=0.05, half_height=0.25)
        b.add_joint_revolute(parent=-1, child=rod, axis="Y",
                             xform_c=[-0.5, 0, 0, 0, 0, 0, 1])
        self.model = b.finalize()
        self.solver = SolverFeatherstone(self.model)
        self.imu = SensorIMU(self.model, sites=[0])
        self.frame_sensor = SensorFrameTransform(
            self.model, reference_frames=[0], target_frames=[0])
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.prev_state = self.state
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        self.last_accel = np.zeros(3)
        viewer.set_model(self.model)

        solver, control, dt = self.solver, self.control, self.sim_dt

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, control, None, dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame

    def step(self):
        self.prev_state = self.state
        self.state = self._frame(self.state)
        self.time += self.sim_dt * self.substeps
        lin_acc, _ang_vel = self.imu.update(
            self.state, self.prev_state, self.sim_dt * self.substeps)
        self.last_accel = np.asarray(lin_acc)[0]
        self.viewer.log_scalar("imu/acc_z", float(self.last_accel[2]))

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        assert np.isfinite(self.last_accel).all()
        X = self.frame_sensor.update(self.state)
        assert np.isfinite(np.asarray(X)).all()
        # pendulum swung under gravity
        assert abs(float(self.state.joint_q[0])) > 0.05
