"""Two-way rigid/soft contact through SolverCoupled: a soft FEM block lands
on a rigid see-saw plank and tips it (reference:
newton/examples/multiphysics/example_rigid_soft_contact.py)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverCoupled, SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder(gravity=-9.81)
        # rigid plank on a revolute pivot (see-saw)
        self.plank = b.add_body(xform=[0, 0, 0.25, 0, 0, 0, 1], key="plank")
        b.add_shape_box(self.plank, hx=0.5, hy=0.15, hz=0.02, key="plank_s")
        b.add_joint_revolute(parent=-1, child=self.plank, axis="Y",
                             xform_p=[0, 0, 0.25, 0, 0, 0, 1], key="pivot")
        b.add_ground_plane()
        # soft block dropped over one end of the plank
        b.add_soft_grid(pos=(0.25, -0.07, 0.4), rot=None, vel=(0, 0, 0),
                        dim_x=2, dim_y=2, dim_z=2,
                        cell_x=0.07, cell_y=0.07, cell_z=0.07,
                        density=800.0, k_mu=2.0e3, k_lambda=2.0e3,
                        k_damp=2.0, radius=0.035)
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        rigid = SolverXPBD(self.model, iterations=6)
        particles = SolverXPBD(self.model, iterations=6)
        self.solver = SolverCoupled(self.model, rigid_solver=rigid,
                                    particle_solver=particles,
                                    consensus_iters=3)
        self.state = self.model.state()
        self.control = self.model.control()
        self.sim_dt = 1.0 / 480.0
        self.substeps = 8
        self.time = 0.0
        viewer.set_model(self.model)

        solver, pipe, control, dt = (self.solver, self.pipeline,
                                     self.control, self.sim_dt)

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, control, pipe.collide(s), dt), None
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
        assert np.isfinite(q).all() and np.isfinite(pq).all()
        # the soft block's weight tipped the see-saw (joint rotated)
        jq = float(np.asarray(self.state.joint_q)[0])
        assert abs(jq) > 0.02, jq
        # block stayed on/above the plank, didn't tunnel through
        assert pq[:, 2].min() > -0.05
