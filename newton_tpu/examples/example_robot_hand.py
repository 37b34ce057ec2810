"""Dexterous 30-dof adroit hand curling its fingers around a free pen —
the high-DoF dexterous-manipulation workload (reference:
examples/robot/example_robot_allegro_hand.py and the Allegro KPI,
asv/benchmarks/simulation/bench_mujoco.py:324). Actuation goes through the
structured MuJoCo actuator tables (position servos via gain/bias), not raw
joint forces.
"""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo

ADROIT_XML = ("/opt/venv/lib/python3.12/site-packages/gymnasium_robotics/"
              "envs/assets/adroit_hand/adroit_pen.xml")


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        self.info = b.add_mjcf(ADROIT_XML)
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
        lo = np.where(au.ctrllimited, au.ctrlrange[:, 0], -1.0)
        hi = np.where(au.ctrllimited, au.ctrlrange[:, 1], 1.0)
        lo_j, hi_j = jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32)

        pipeline, solver, dt = self.pipeline, self.solver, self.sim_dt
        base_control = self.control

        @jax.jit
        def frame(state, t):
            # slow open/close sweep across every servo's ctrlrange
            u = 0.5 + 0.5 * jnp.sin(2.0 * jnp.pi * 0.25 * t)
            ctrl = lo_j + u * (hi_j - lo_j)
            control = base_control.replace(
                custom=dict(base_control.custom, **{"mjc:ctrl": ctrl}))

            def sub(s, _):
                c = pipeline.collide(s)
                return solver.step(s, None, control, c, dt), None
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
        assert np.isfinite(q).all(), "non-finite hand coordinates"
        qd = np.asarray(self.state.joint_qd)
        assert np.abs(qd).max() < 100.0, f"hand dof velocity {np.abs(qd).max()}"
