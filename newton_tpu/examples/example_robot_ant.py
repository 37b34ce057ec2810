"""Ant robot with random actuation under the generalized solver
(reference: newton/examples/robot/ examples + asv bench_mujoco workload)."""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo

ANT_XML = ("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/"
           "assets/ant.xml")


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder()
        self.info = builder.add_mjcf(ANT_XML)
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverMuJoCo(self.model, iterations=8, integrator="euler")
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        self.key = jax.random.PRNGKey(0)
        D = self.model.joint_dof_count
        self.gear = self.model.custom.get(
            "mjc:actuator_gear", jnp.zeros((D,), dtype=jnp.float32))
        viewer.set_model(self.model)

        pipeline, solver, dt = self.pipeline, self.solver, self.sim_dt
        base_control = self.control

        @jax.jit
        def frame(state, key):
            ctrl_vec = jax.random.uniform(
                key, (D,), minval=-0.3, maxval=0.3)
            control = base_control.replace(joint_f=ctrl_vec * self.gear)

            def sub(s, _):
                c = pipeline.collide(s)
                return solver.step(s, None, control, c, dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame

    def step(self):
        self.key, sub = jax.random.split(self.key)
        self.state = self._frame(self.state, sub)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.log_scalar("torso_height", float(self.state.joint_q[2]))
        self.viewer.end_frame()

    def test_final(self):
        h = float(self.state.joint_q[2])
        assert 0.1 < h < 1.5, f"ant torso height {h}"
        qn = float(jnp.linalg.norm(self.state.joint_q[3:7]))
        assert abs(qn - 1.0) < 1e-2, f"quaternion norm {qn}"
