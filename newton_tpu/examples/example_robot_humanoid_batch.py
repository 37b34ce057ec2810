"""Batched humanoids: replicate() + generalized solver over N worlds
(the reference KPI benchmark shape, asv/benchmarks/simulation/bench_mujoco.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo

HUMANOID_XML = ("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/"
                "mujoco/assets/humanoid.xml")


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        worlds = getattr(args, "num_worlds", 4) if args else 4
        robot = nt.ModelBuilder()
        robot.add_mjcf(HUMANOID_XML)
        builder = nt.ModelBuilder()
        builder.replicate(robot, worlds)
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverMuJoCo(self.model, iterations=8, integrator="euler")
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        pipeline, solver, control, dt = (self.pipeline, self.solver,
                                         self.control, self.sim_dt)

        @jax.jit
        def frame(state):
            def sub(s, _):
                c = pipeline.collide(s)
                return solver.step(s, None, control, c, dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame
        self.worlds = worlds

    def step(self):
        self.state = self._frame(self.state)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        jq = np.asarray(self.state.joint_q)
        assert np.isfinite(jq).all()
        # every world's root height within physical bounds
        nq_per = self.model.joint_coord_count // self.worlds
        heights = jq.reshape(self.worlds, nq_per)[:, 2]
        assert (heights > 0.2).all() and (heights < 2.0).all(), heights
