"""Franka Panda IK reach (reference:
newton/examples/ik/example_ik_franka.py): the 7-dof Panda arm (gymnasium-
robotics franka_assets MJCF, meshes and all) tracks a circle of Cartesian
targets with the batched multi-seed Levenberg-Marquardt IK solver; each
solve warm-starts from the previous pose and the solved chain is posed by
FK. Gates the IK stack on a real redundant manipulator."""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.ik import IKObjectivePosition, IKSolver
from newton_tpu.sim.articulation import eval_fk

FRANKA_DIR = ("/opt/venv/lib/python3.12/site-packages/gymnasium_robotics/"
              "envs/assets/kitchen_franka/franka_assets")
# the shipped Panda is split into <mujocoinclude> fragments (the kitchen
# model assembles them); this wrapper mounts just the arm
FRANKA_XML = f"""
<mujoco model="panda">
  <compiler angle="radian" meshdir="{FRANKA_DIR}/meshes"
            inertiafromgeom="auto"/>
  <include file="{FRANKA_DIR}/assets.xml"/>
  <worldbody>
    <include file="{FRANKA_DIR}/chain.xml"/>
  </worldbody>
  <include file="{FRANKA_DIR}/actuator.xml"/>
</mujoco>
"""


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder(gravity=0.0)
        self.info = b.add_mjcf(FRANKA_XML)
        self.model = b.finalize()
        keys = list(self.model.structure.body_key)
        self.ee = keys.index("panda0_link7")
        self.ik = IKSolver(
            self.model,
            [IKObjectivePosition(link=self.ee, offset=(0.0, 0.0, 0.1))],
            joint_limit_weight=0.1, iterations=12, n_seeds=2)
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.time = 0.0
        self.sim_dt = 1.0 / 30.0
        self.err = []
        viewer.set_model(self.model)
        self._solve = jax.jit(lambda q0, t: self.ik.solve(q0, [t]))

    def _target(self):
        ang = 2.0 * np.pi * 0.15 * self.time
        return np.array([0.45 + 0.1 * np.cos(ang),
                         0.15 * np.sin(ang), 0.55])

    def step(self):
        target = jnp.asarray(self._target())[None]   # (1, 3) batch
        q = self._solve(self.state.joint_q, target)[0]
        self.state = eval_fk(self.model, q,
                             jnp.zeros_like(self.state.joint_qd), self.state)
        # measured reach error through FK (what the user actually gets)
        bq = np.asarray(self.state.body_q)[self.ee]
        x, y, z, w = bq[3:7]
        off = np.array([0.0, 0.0, 0.1])
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])
        ee_p = bq[:3] + R @ off
        self.err.append(float(np.linalg.norm(ee_p - np.asarray(target)[0])))
        self.time += self.sim_dt

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        assert np.isfinite(np.asarray(self.state.joint_q)).all()
        # after warm-started tracking settles, the reach error is small
        tail = self.err[2:] if len(self.err) > 2 else self.err
        assert np.median(tail) < 0.03, (np.median(tail), tail[-3:])
