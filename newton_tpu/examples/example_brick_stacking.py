"""Running-bond brick wall stays standing under gravity (reference:
newton/examples/contacts/example_brick_stacking.py). Uses the generalized
solver's PGS contact stack, which holds deep stacks without jitter."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo

ROWS = 12   # 3x the r4 height — holds without per-scene tuning since the
COLS = 3    # clipped box-box manifolds + uncapped two-sided contact solve
BX, BY, BZ = 0.12, 0.06, 0.045  # brick half-extents


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=-9.81)
        cfg = builder.default_shape_cfg.copy()
        cfg.mu = 0.8

        self.bricks = []
        for row in range(ROWS):
            # quarter-bond offset: adjacent rows shift by BX/2 so the
            # staircase-end brick COM stays BX/2 inside its support
            offset = (row % 2 - 0.5) * (BX / 2)
            for col in range(COLS):
                pos = [offset + col * 2 * BX * 1.01 - COLS * BX,
                       0.0, BZ + row * 2 * BZ * 1.002]
                bb = builder.add_body(xform=pos + [0, 0, 0, 1],
                                      key=f"brick_{row}_{col}")
                builder.add_shape_box(bb, hx=BX, hy=BY, hz=BZ, cfg=cfg,
                                      key=f"brick_shape_{row}_{col}")
                builder.add_joint_free(bb, key=f"brick_free_{row}_{col}")
                self.bricks.append((bb, pos[2]))
        builder.add_ground_plane()
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverMuJoCo(self.model, iterations=30,
                                   integrator="euler", contact_cap=0)
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
        assert np.isfinite(q).all()
        for bb, z0 in self.bricks:
            assert abs(q[bb, 2] - z0) < 0.02, (bb, q[bb, 2], z0)
            # still upright
            x, y = q[bb, 3], q[bb, 4]
            assert 1.0 - 2.0 * (x * x + y * y) > 0.95
