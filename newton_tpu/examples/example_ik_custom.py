"""Custom IK objective (reference: newton/examples/ik/example_ik_custom.py
— user-defined residual classes plug into the solver). The solver is
duck-typed: anything with ``n_residuals`` and
``residual(model, body_q, target)`` joins the Levenberg-Marquardt stack.
Here a 3-link arm reaches a target while a custom objective holds the
elbow above a table plane."""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.ik import IKObjectivePosition, IKSolver
from newton_tpu.math import transform_point
from newton_tpu.sim.articulation import eval_fk

TABLE_Z = 0.9


class ElbowAbovePlane:
    """Custom one-row residual: penalize the elbow dipping below z=TABLE_Z.
    ``target`` is unused (pass zeros) — the constraint is scene-fixed."""

    n_residuals = 1

    def __init__(self, link, weight=4.0):
        self.link = link
        self.weight = weight

    def residual(self, model, body_q, target):
        z = body_q[self.link][2]
        viol = jnp.minimum(z - TABLE_Z, 0.0)
        return self.weight * viol[None] + 0.0 * target[..., :1]


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
            [IKObjectivePosition(link=2, offset=(0.5, 0, 0)),
             ElbowAbovePlane(link=1)],
            iterations=24, n_seeds=4)
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.time = 0.0
        self.sim_dt = 1.0 / 30.0
        viewer.set_model(self.model)
        self._solve = jax.jit(
            lambda q0, t: self.ik.solve(q0, [t, jnp.zeros((1, 1))]))

    def step(self):
        ang = 2.0 * np.pi * 0.15 * self.time
        self._target = jnp.asarray(
            [[1.5 + 0.5 * np.cos(ang), 0.0, 1.2 + 0.3 * np.sin(ang)]])
        q = self._solve(self.state.joint_q, self._target)[0]
        self.state = eval_fk(self.model, q,
                             jnp.zeros_like(self.state.joint_qd), self.state)
        self.time += self.sim_dt

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        bq = np.asarray(self.state.body_q)
        assert np.isfinite(bq).all()
        tip = np.asarray(transform_point(
            self.state.body_q[2],
            jnp.asarray([0.5, 0, 0], dtype=self.state.body_q.dtype)))
        err = np.linalg.norm(tip - np.asarray(self._target[0]))
        assert err < 0.08, f"tip error {err:.4f}"
        # the custom objective held the elbow above the table plane
        assert bq[1, 2] > TABLE_Z - 0.05, bq[1, 2]
