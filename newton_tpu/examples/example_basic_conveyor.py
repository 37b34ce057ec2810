"""Conveyor belt: a kinematic belt slab moving at constant speed drags
cargo boxes along through contact friction (reference:
newton/examples/basic/example_basic_conveyor.py — the reference builds a
ring belt with prescribed joint motion; same physics, linear belt here)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers.solver_xpbd import SolverXPBD

BELT_SPEED = 0.75  # m/s


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=-9.81)
        cfg = builder.default_shape_cfg.copy()
        cfg.mu = 0.9

        # kinematic belt slab translating +x at BELT_SPEED
        belt = builder.add_body(
            xform=[0.0, 0.0, 0.05, 0, 0, 0, 1],
            qd=np.array([BELT_SPEED, 0, 0, 0, 0, 0]),
            kinematic=True, key="belt")
        builder.add_shape_box(belt, hx=2.0, hy=0.5, hz=0.05, cfg=cfg,
                              key="belt_top")

        # cargo boxes resting on the belt
        self.boxes = []
        for i in range(3):
            bb = builder.add_body(
                xform=[-1.2 + 0.5 * i, 0.0, 0.2, 0, 0, 0, 1],
                key=f"bag_{i}")
            builder.add_shape_box(bb, hx=0.1, hy=0.1, hz=0.1, cfg=cfg,
                                  key=f"bag_shape_{i}")
            builder.add_joint_free(bb, key=f"bag_free_{i}")
            self.boxes.append(bb)
        builder.add_ground_plane()
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=4)
        self.state = self.model.state()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        solver, pipe, dt = self.solver, self.pipeline, self.sim_dt

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, None, pipe.collide(s), dt), None
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
        qd = np.asarray(self.state.body_qd)
        assert np.isfinite(q).all()
        # friction dragged every box with the belt
        for bb in self.boxes:
            assert qd[bb, 0] > 0.2 * BELT_SPEED, qd[bb]
        assert all(q[bb, 2] > 0.1 for bb in self.boxes)  # still on the belt
