"""Generalized-coordinate rigid solver coupled to XPBD cloth (reference:
newton/examples/multiphysics/example_mujoco_xpbd_coupled_solver.py): a
cloth square drapes over an articulated seesaw stepped by SolverMuJoCo
while SolverXPBD owns the particles; SolverCoupled's ADMM consensus
exchanges contact wrenches — riding the generalized solver's
State.body_f (xfrc_applied) path — so the cloth's weight visibly tilts
the seesaw."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverCoupled, SolverMuJoCo, SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=-9.81)
        # seesaw: a plank on a frictionless hinge, balanced at start
        plank = builder.add_body(xform=[0, 0, 0.3, 0, 0, 0, 1], key="plank")
        builder.add_shape_box(plank, hx=0.5, hy=0.22, hz=0.02)
        builder.add_joint_revolute(-1, plank, axis="Y",
                                   xform_p=[0, 0, 0.3, 0, 0, 0, 1],
                                   key="hinge")
        # cloth dropped over one end of the plank
        builder.add_cloth_grid(pos=(0.22, -0.16, 0.45), dim_x=6, dim_y=6,
                               cell_x=0.05, cell_y=0.05, mass=0.8,
                               radius=0.012, tri_ke=800.0, tri_kd=5.0,
                               edge_ke=2.0)
        builder.add_ground_plane()
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverCoupled(
            self.model,
            rigid_solver=SolverMuJoCo(self.model, iterations=4),
            particle_solver=SolverXPBD(self.model, iterations=4),
            consensus_iters=2)
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0,
                             self.solver.init_state(self.model.state()))
        self.control = self.model.control()
        self.sim_dt = 1.0 / 480.0
        self.substeps = 8
        self.time = 0.0
        viewer.set_model(self.model)

        solver, pipe, ctrl, dt = (self.solver, self.pipeline, self.control,
                                  self.sim_dt)

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, ctrl, pipe.collide(s), dt), None
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
        q = np.asarray(self.state.body_q)
        pq = np.asarray(self.state.particle_q)
        jq = np.asarray(self.state.joint_q)
        assert np.isfinite(q).all() and np.isfinite(pq).all()
        # the cloth's weight on the +x end tipped the seesaw toward it
        # (positive rotation about +y lowers the +x end)
        assert jq[0] > 0.02, jq
        # cloth came to rest ON the plank/ground (not through, not flying)
        assert pq[:, 2].min() > -0.01, pq[:, 2].min()
        assert pq[:, 2].max() < 0.6, pq[:, 2].max()
