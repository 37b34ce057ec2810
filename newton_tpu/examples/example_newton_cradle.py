"""Newton's cradle: five steel balls on wire pendulums; one raised ball
transfers its momentum through the resting chain so the far ball swings out
(reference: newton/examples/contacts/example_newton_cradle.py).

Simultaneous near-rigid impacts are the classic stress test for restitution
handling: a sequential/positional solver that smears the impact across the
chain launches several balls at half speed instead of one at full speed.
XPBD's velocity-level restitution pass with a tight contact margin gets the
canonical outcome.
"""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers.solver_xpbd import SolverXPBD

N = 5
R = 0.05            # ball radius
L = 0.5             # wire length
GAP = 2e-3          # resting gap: impacts resolve pairwise (sequential
                    # binary collisions), the regime where an impulse chain
                    # reproduces the textbook cradle


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder(gravity=-9.81)
        cfg = b.default_shape_cfg.copy()
        cfg.mu = 0.0
        cfg.restitution = 1.0
        cfg.contact_margin = 0.01

        self.balls = []
        for i in range(N):
            x = i * (2 * R + GAP)
            pivot = [x, 0.0, L + R]
            ball = b.add_body(xform=[x, 0.0, R, 0, 0, 0, 1],
                              key=f"ball_{i}")
            b.add_shape_sphere(ball, radius=R, cfg=cfg)
            # wire = revolute joint about y at the pivot, parent = world
            b.add_joint_revolute(
                -1, ball, axis=[0.0, 1.0, 0.0],
                xform_p=pivot + [0, 0, 0, 1],
                xform_c=[0.0, 0.0, L, 0, 0, 0, 1],
                key=f"wire_{i}")
            self.balls.append(ball)

        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=8)

        # raise the first ball by 60 degrees away from the chain (-x side;
        # positive hinge angle about +y displaces the ball toward -x)
        q0 = np.asarray(self.model.joint_q0).copy()
        q0[0] = np.deg2rad(60.0)
        self.state = eval_fk(self.model, q0, self.model.joint_qd0,
                             self.model.state())
        self.control = self.model.control()
        self.sim_dt = 1.0 / 600.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        solver, pipe, control, dt = (self.solver, self.pipeline,
                                     self.control, self.sim_dt)

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, control, pipe.collide(s),
                                   dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame
        self._max_last = 0.0

    def step(self):
        self.state = self._frame(self.state)
        self.time += self.sim_dt * self.substeps
        # far ball swings outward toward +x, i.e. negative hinge angle
        last = -float(np.asarray(self.state.joint_q)[N - 1])
        self._max_last = max(self._max_last, last)

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        q = np.asarray(self.state.joint_q)
        assert np.isfinite(q).all()
        # the far ball must have swung out well past the middle balls
        assert self._max_last > np.deg2rad(25.0), (
            f"far ball peak {np.rad2deg(self._max_last):.1f} deg")
        # the middle balls stay near rest throughout the first transfer
        mids = np.abs(q[1:N - 1])
        assert np.all(mids < np.deg2rad(15.0)), np.rad2deg(mids)


if __name__ == "__main__":
    from newton_tpu.examples import init, run
    viewer, args = init()
    run(Example(viewer, args), args)
