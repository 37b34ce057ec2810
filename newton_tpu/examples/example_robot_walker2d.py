"""Walker2d batch rollout (reference: newton/examples robot family, e.g.
example_robot_anymal_c_walk.py — locomotion robot driven through MuJoCo
actuators): the gymnasium walker2d MJCF (planar slide+hinge root, 6
actuated joints) stepped by SolverMuJoCo under a sinusoidal gait-shaped
ctrl schedule."""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo

WALKER_XML = ("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/"
              "mujoco/assets/walker2d.xml")


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        self.info = b.add_mjcf(WALKER_XML)
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverMuJoCo(self.model, iterations=8,
                                   integrator="euler")
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        solver, pipe, dt = self.solver, self.pipeline, self.sim_dt
        # joint-space PD stance hold + a small gait overlay on the hips: the
        # walker has no policy here, so the hold keeps it standing while the
        # overlay shifts its weight (leg dofs follow the 3 planar root dofs)
        nd = len(np.asarray(self.model.joint_qd0))
        leg = np.arange(3, nd)
        kp, kd = 60.0, 4.0

        @jax.jit
        def frame(state, t):
            def sub(s, _):
                q_t = 0.12 * jnp.sin(6.0 * t) * jnp.asarray(
                    [1.0, 0, 0, -1.0, 0, 0])[: len(leg)]
                tau = kp * (q_t - s.joint_q[leg]) - kd * s.joint_qd[leg]
                control = self.control.replace(
                    joint_f=self.control.joint_f.at[leg].set(tau))
                return solver.step(s, None, control, pipe.collide(s),
                                   dt), None
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
        q = np.asarray(self.state.body_q)
        qd = np.asarray(self.state.body_qd)
        assert np.isfinite(q).all() and np.isfinite(qd).all()
        # torso stays above the ground plane (not fallen through / exploded)
        assert q[0, 2] > 0.9, q[0, 2]   # still standing, not fallen
        assert np.abs(qd).max() < 50.0, np.abs(qd).max()
