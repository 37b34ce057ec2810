"""Two-finger prismatic gripper squeezing a neo-Hookean soft cube and
lifting force balance: the fingers close under driven slide joints, the FEM
grid deforms between them (reference:
examples/vbd/example_vbd_gripper_soft_grid.py — there the gripper is
kinematic and the soft body is VBD; here driven prismatic joints + XPBD
FEM with rigid-particle contact).
"""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        # soft cube sitting on the ground between the fingers
        b.add_soft_grid(pos=(-0.15, -0.15, 0.02), rot=None, vel=(0, 0, 0),
                        dim_x=4, dim_y=4, dim_z=4,
                        cell_x=0.075, cell_y=0.075, cell_z=0.075,
                        density=300.0, k_mu=5.0e3, k_lambda=2.0e4,
                        k_damp=3.0, radius=0.035)
        # two fingers on opposed prismatic joints along x
        for side, sx in (("l", -1.0), ("r", 1.0)):
            f = b.add_body(xform=[sx * 0.45, 0.0, 0.22, 0, 0, 0, 1],
                           key=f"finger_{side}")
            b.add_shape_box(f, hx=0.04, hy=0.18, hz=0.2)
            b.add_joint_prismatic(
                parent=-1, child=f, axis=(1.0, 0.0, 0.0),
                xform_p=[sx * 0.45, 0.0, 0.22, 0, 0, 0, 1],
                limit_lower=-0.45, limit_upper=0.45, key=f"slide_{side}")
        b.add_ground_plane()
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=6)
        self.state = self.model.state()
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        pipeline, solver, base_control, dt = (self.pipeline, self.solver,
                                              self.control, self.sim_dt)
        kp, kd = 400.0, 40.0

        @jax.jit
        def frame(state, t):
            # ramp closed over 1.2 s to x = -/+0.19 (cube half-width 0.15 +
            # finger half-thickness 0.04): left coord -0.45 -> -0.19 means
            # +0.26 along its slide axis, right the mirror image
            close = jnp.minimum(t / 1.2, 1.0)
            q_tgt = jnp.array([0.26, -0.26]) * close

            def sub(s, _):
                f = kp * (q_tgt - s.joint_q) - kd * s.joint_qd
                ctl = base_control.replace(joint_f=f)
                c = pipeline.collide(s)
                return solver.step(s, None, ctl, c, dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame

    def step(self):
        self.state = self._frame(self.state, jnp.float32(self.time))
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        gap = float(self.state.body_q[1, 0] - self.state.body_q[0, 0])
        self.viewer.log_scalar("finger_gap", gap)
        self.viewer.end_frame()

    def test_final(self):
        pq = np.asarray(self.state.particle_q)
        assert np.isfinite(pq).all()
        # the cube is squeezed, not ejected: particles stay near origin
        assert np.abs(pq[:, 0]).max() < 0.6, "cube ejected in x"
        assert pq[:, 2].min() > -0.05, "particles through the ground"
        # fingers actually closed
        gap = float(self.state.body_q[1, 0] - self.state.body_q[0, 0])
        assert gap < 0.75, f"fingers never closed (gap {gap})"
