"""Cartpole balance: gymnasium's inverted-pendulum MJCF stabilized by a
hand-tuned state-feedback controller on the cart force (reference:
examples/robot/example_robot_cartpole.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.solvers import SolverMuJoCo

ASSET = ("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/"
         "assets/inverted_pendulum.xml")


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        b.add_mjcf(ASSET)
        self.model = b.finalize()
        self.solver = SolverMuJoCo(self.model, iterations=4, integrator="euler")
        # start slightly off-vertical so the controller has work to do
        q0 = self.model.joint_q0.at[1].set(0.12)
        self.state = eval_fk(self.model, q0, self.model.joint_qd0,
                             self.model.state())
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        solver, dt = self.solver, self.sim_dt
        control = self.control

        @jax.jit
        def frame(state):
            def sub(s, _):
                # state feedback: cart pos/vel + pole angle/rate -> force
                x, th = s.joint_q[0], s.joint_q[1]
                xd, thd = s.joint_qd[0], s.joint_qd[1]
                f = 30.0 * x + 40.0 * xd + 500.0 * th + 80.0 * thd
                c = control.replace(
                    joint_f=control.joint_f.at[0].set(f))
                return solver.step(s, None, c, None, dt), None
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
        th = float(self.state.joint_q[1])
        x = float(self.state.joint_q[0])
        assert abs(th) < 0.12, f"pole fell: theta={th:.3f}"
        assert abs(x) < 0.9, f"cart ran away: x={x:.3f}"
        assert np.isfinite(np.asarray(self.state.joint_q)).all()


if __name__ == "__main__":
    from newton_tpu.examples import init, run
    viewer, args = init()
    run(Example(viewer, args), args)
