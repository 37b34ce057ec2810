"""Batched IK: a 3-link planar arm reaches a circle of moving targets
(reference: newton/examples ik example family; ik_solver.py multi-seed LM)."""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.ik import IKObjectivePosition, IKSolver
from newton_tpu.sim.articulation import eval_fk


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=0.0)
        parent = -1
        for i in range(3):
            link = builder.add_body(
                xform=[0.5 + i, 0, 1, 0, 0, 0, 1], key=f"link_{i}")
            builder.add_shape_capsule(link, radius=0.04, half_height=0.45)
            builder.add_joint_revolute(
                parent, link, axis="Y",
                xform_p=([0, 0, 1, 0, 0, 0, 1] if i == 0
                         else [0.5, 0, 0, 0, 0, 0, 1]),
                xform_c=[-0.5, 0, 0, 0, 0, 0, 1],
                key=f"j{i}")
            parent = link
        self.model = builder.finalize()
        self.ik = IKSolver(
            self.model,
            [IKObjectivePosition(link=2, offset=(0.5, 0, 0))],
            joint_limit_weight=0.0, iterations=16, n_seeds=4)
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.time = 0.0
        self.sim_dt = 1.0 / 30.0
        viewer.set_model(self.model)
        self._solve = jax.jit(lambda q0, t: self.ik.solve(q0, [t]))

    def step(self):
        ang = 2.0 * np.pi * 0.2 * self.time
        target = jnp.asarray(
            [[1.2 + 0.8 * np.cos(ang), 0.0, 1.0 + 0.8 * np.sin(ang)]])
        q = self._solve(self.state.joint_q, target)[0]
        self.state = eval_fk(self.model, q,
                             jnp.zeros_like(self.state.joint_qd), self.state)
        self._last_target = np.asarray(target[0])
        self.time += self.sim_dt

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        q = np.asarray(self.state.body_q)
        assert np.isfinite(q).all()
        from newton_tpu.math import transform_point
        tip = np.asarray(transform_point(self.state.body_q[2],
                                         jnp.asarray([0.5, 0, 0])))
        err = float(np.linalg.norm(tip - self._last_target))
        assert err < 0.05, f"IK tip error {err}"
