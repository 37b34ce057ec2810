"""ONNX-policy-in-the-loop ant: obs -> ONNX graph -> torques -> step.

Mirrors the reference's pretrained-policy workload (reference:
examples/robot/example_robot_anymal_c_walk.py:188-301 and asv
bench_anymal.py:22-52 — obs kernel -> ONNX policy via warp-nn -> joint
drives, with a forward-progress validity gate). Here the policy is a real
ONNX binary executed by the self-contained decoder+interpreter
(controllers/onnx_runtime.py) INSIDE the jitted physics loop — one fused
XLA program, no separate inference runtime.

The policy itself is a synthesized trot gait (phase features -> linear ->
tanh) serialized through ``encode_mlp``: no pretrained ANYmal checkpoint
ships in this environment, so the example demonstrates the full ONNX
execution path and gates on actual forward progress like the reference
benchmark does.
"""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.controllers import OnnxModule, encode_mlp
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo

ANT_XML = ("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/"
           "assets/ant.xml")


def _gait_policy_onnx(actuators):
    """Serialize a trot-gait policy as ONNX bytes: obs = [sin, cos] phase
    features; diagonal leg pairs in antiphase; hips swing on sin, ankles
    push on cos."""
    W = np.zeros((2, 8), np.float32)
    b = np.zeros(8, np.float32)
    for a in actuators:
        name = a["name"]
        col = [x["name"] for x in actuators].index(name)
        leg = int(name.split("_")[-1])
        sign = 1.0 if leg in (1, 3) else -1.0
        if name.startswith("hip"):
            W[0, col] = 0.5 * sign
        else:
            W[1, col] = 0.9 * sign
    return encode_mlp([(W, b)], output_activation="Tanh")


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder()
        info = builder.add_mjcf(ANT_XML)
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverMuJoCo(self.model, iterations=8, integrator="euler")
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        model = self.model
        D = model.joint_dof_count

        # the ONNX policy bytes -> executable module (decoder+interpreter)
        self.policy = OnnxModule(_gait_policy_onnx(info["actuators"]))
        act_dofs = np.asarray([a["dof"] for a in info["actuators"]],
                              np.int32)
        gear = model.custom["mjc:actuator_gear"]
        self.x0 = float(self.state.joint_q[0])
        self.y0 = float(self.state.joint_q[1])
        viewer.set_model(model)

        pipeline, solver, control, dt = (self.pipeline, self.solver,
                                         self.control, self.sim_dt)
        policy = self.policy
        freq = 2.2  # gait frequency (Hz)

        @jax.jit
        def frame(state, t):
            phase = 2.0 * jnp.pi * freq * t
            obs = jnp.stack([jnp.sin(phase), jnp.cos(phase)])[None]
            action = policy(obs)[0]                      # (8,) in [-1, 1]
            tau = jnp.zeros((D,)).at[act_dofs].set(
                action * gear[act_dofs])
            ctl = control.replace(joint_f=tau)

            def sub(s, _):
                return solver.step(s, None, ctl, pipeline.collide(s),
                                   dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame

    def step(self):
        self.state = self._frame(self.state, self.time)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        jq = np.asarray(self.state.joint_q)
        assert np.isfinite(jq).all()
        # validity gates in the spirit of the reference's bench_anymal:
        # body stays upright and the gait makes real progress
        assert 0.2 < jq[2] < 1.2, f"ant torso height {jq[2]}"
        progress = float(np.hypot(jq[0] - self.x0, jq[1] - self.y0))
        assert progress > 0.08, f"gait made no progress: {progress:.3f} m"
