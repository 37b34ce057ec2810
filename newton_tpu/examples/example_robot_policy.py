"""Neural-policy-in-the-loop ant: obs -> MLP -> torques -> step, one jit.

Mirrors the reference's policy examples
(reference: examples/robot/example_robot_anymal_c_walk.py:188-301 — obs
kernel -> ONNX policy via warp-nn -> joint targets). Here the policy is a
JAX MLP evaluated inline with the physics, so the whole control loop is one
fused XLA program (the reference needs a separate inference runtime).
Weights are random (demonstration); swap in trained weights via
``ControllerNeuralMLP`` or ``load_onnx_weights``.
"""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.controllers import ControllerNeuralMLP
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo

ANT_XML = ("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/"
           "assets/ant.xml")


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder()
        builder.add_mjcf(ANT_XML)
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverMuJoCo(self.model, iterations=8)
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        model = self.model
        Q, D = model.joint_coord_count, model.joint_dof_count
        obs_dim = Q + D
        act_dim = 8  # ant actuators
        rng = np.random.default_rng(0)
        params = []
        dims = [obs_dim, 64, 64, act_dim]
        for i in range(len(dims) - 1):
            params.append((rng.normal(0, 1 / np.sqrt(dims[i]),
                                      (dims[i], dims[i + 1])),
                           np.zeros(dims[i + 1])))
        self.policy = ControllerNeuralMLP(params, activation="tanh",
                                          output_activation="tanh")
        gear = model.custom["mjc:actuator_gear"]
        act_dofs = np.nonzero(np.asarray(gear))[0]
        viewer.set_model(model)

        pipeline, solver, control, dt = (self.pipeline, self.solver,
                                         self.control, self.sim_dt)
        policy = self.policy

        @jax.jit
        def frame(state):
            obs = jnp.concatenate([state.joint_q, state.joint_qd])
            action = policy(model, state, obs, act_dofs)
            tau = jnp.zeros((D,)).at[act_dofs].set(
                action * gear[act_dofs])
            ctl = control.replace(joint_f=tau)

            def sub(s, _):
                return solver.step(s, None, ctl, pipeline.collide(s), dt), None
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
        jq = np.asarray(self.state.joint_q)
        assert np.isfinite(jq).all()
        assert 0.1 < jq[2] < 1.5
