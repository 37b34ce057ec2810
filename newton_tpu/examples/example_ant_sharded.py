"""Ant env batch sharded across all available devices via jax.sharding
(reference: multi-GPU env batching; SURVEY §1 ICI mapping — on a real pod
the env axis rides the mesh, on one chip this degenerates gracefully)."""

import os

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.parallel import batch_state, shard_batched_state
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers.generalized.solver import SolverMuJoCo

_ASSET = ("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/"
          "assets/ant.xml")


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        n_dev = max(len(jax.devices()), 1)
        self.worlds = max(getattr(args, "num_worlds", 4), n_dev)
        self.worlds = (self.worlds // n_dev) * n_dev or n_dev

        robot = nt.ModelBuilder()
        robot.add_mjcf(_ASSET)
        self.model = robot.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverMuJoCo(self.model, iterations=4, integrator="euler")
        s1 = eval_fk(self.model, self.model.joint_q0, self.model.joint_qd0,
                     self.model.state())
        self.state = batch_state(s1, self.worlds)
        if n_dev > 1:
            from jax.sharding import Mesh
            mesh = Mesh(np.asarray(jax.devices()), ("env",))
            self.state = shard_batched_state(self.state, mesh)
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
                c = jax.vmap(pipeline.collide)(s)
                return solver.step_batched(s, None, None, c, dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame

    def step(self):
        self.state = self._frame(self.state)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        # show world 0 only (viewer logging is host-side anyway)
        self.viewer.log_state(jax.tree.map(lambda x: x[0], self.state))
        self.viewer.end_frame()

    def test_final(self):
        q = np.asarray(self.state.joint_q)
        assert np.isfinite(q).all()
        assert (q[:, 2] > 0.1).all(), "an ant fell through the ground"
