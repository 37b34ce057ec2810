"""Half-cheetah batch rollout (reference: newton/examples robot family):
the gymnasium half_cheetah MJCF — planar root, 6 actuated leg joints with
per-joint gear ratios — stepped by SolverMuJoCo under an open-loop bounding
ctrl schedule. Exercises the importer's planar-root path and geared motors
on a third gymnasium morphology beyond ant/humanoid."""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo

CHEETAH_XML = ("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/"
               "mujoco/assets/half_cheetah.xml")


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        self.info = b.add_mjcf(CHEETAH_XML)
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverMuJoCo(self.model, iterations=8)
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        au = self.model.structure.mjc_actuation
        n_act = au.ctrlrange.shape[0]
        solver, pipe, dt = self.solver, self.pipeline, self.sim_dt
        # back legs lead the front by half a cycle: a bounding gait
        phase = jnp.asarray([0.0, 0.8, 1.6, jnp.pi, jnp.pi + 0.8,
                             jnp.pi + 1.6])[:n_act]

        @jax.jit
        def frame(state, t):
            ctrl = 0.3 * jnp.sin(10.0 * t + phase)
            control = self.control.replace(
                custom=dict(self.control.custom,
                            **{"mjc:ctrl": ctrl.astype(state.joint_q.dtype)}))

            def sub(s, _):
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
        # torso stays near its running height, never tunnels or launches
        assert 0.1 < q[0, 2] < 2.0, q[0, 2]
        assert np.abs(qd).max() < 50.0, np.abs(qd).max()
