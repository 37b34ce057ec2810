"""Muscle-tendon actuation: a muscle spanning two free bodies contracts
under a sinusoidal activation signal (reference: examples muscle usage of
builder.py:6303 add_muscle + semi-implicit eval_muscles)."""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.solvers import SolverSemiImplicit


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=0.0)
        b1 = builder.add_body(xform=[0, 0, 1, 0, 0, 0, 1], key="left")
        builder.add_shape_box(b1, hx=0.1, hy=0.1, hz=0.1)
        builder.add_joint_free(b1)
        b2 = builder.add_body(xform=[1, 0, 1, 0, 0, 0, 1], key="right")
        builder.add_shape_box(b2, hx=0.1, hy=0.1, hz=0.1)
        builder.add_joint_free(b2)
        builder.add_muscle([b1, b2], [(0.1, 0, 0), (-0.1, 0, 0)],
                           f0=50.0, lm=0.5, lt=0.1, lmax=1.0, pen=0.1)
        self.model = builder.finalize()
        self.solver = SolverSemiImplicit(self.model)
        self.state = self.model.state()
        self.control = self.model.control()
        self.sim_dt = 1.0 / 1000.0
        self.substeps = 10
        self.time = 0.0
        viewer.set_model(self.model)

        solver, dt = self.solver, self.sim_dt

        @jax.jit
        def frame(state, control):
            def sub(s, _):
                s = s.clear_forces()
                return solver.step(s, None, control, None, dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame

    def step(self):
        act = 0.5 + 0.5 * np.sin(2.0 * np.pi * 0.5 * self.time)
        control = self.control.replace(
            muscle_activations=jnp.full((1,), act))
        self.state = self._frame(self.state, control)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        q = np.asarray(self.state.body_q)
        assert np.isfinite(q).all()
        gap = float(np.linalg.norm(q[1, :3] - q[0, :3]))
        assert gap < 1.0, f"muscle never contracted: gap {gap}"
