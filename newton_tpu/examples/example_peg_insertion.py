"""Tight-tolerance peg insertion (reference:
newton/examples/contacts/example_contacts_rj45_plug.py — a connector
seats into a socket with sub-millimeter clearance). A square peg drops
into a four-wall socket with 2 mm total clearance; multi-point persistent
manifolds keep the lateral contacts stable while the peg slides home
instead of jamming or tunneling."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo

PEG = 0.05          # peg half-width
CLEAR = 0.001       # per-side clearance
DEPTH = 0.12        # socket wall half-height


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=-9.81)
        cfg = builder.default_shape_cfg.copy()
        cfg.mu = 0.2
        w = PEG + CLEAR
        t = 0.02
        # socket: four static walls around a square pocket
        for dx, dy, hx, hy in ((w + t, 0.0, t, w + 2 * t),
                               (-(w + t), 0.0, t, w + 2 * t),
                               (0.0, w + t, w, t),
                               (0.0, -(w + t), w, t)):
            builder.add_shape_box(-1, xform=[dx, dy, DEPTH, 0, 0, 0, 1],
                                  hx=hx, hy=hy, hz=DEPTH, cfg=cfg)
        # peg starts slightly offset/tilted, nose already in the chamferless
        # mouth (a 1.1-degree tilt on a 1 mm clearance catches on the rim,
        # exactly like real connectors without a lead-in chamfer)
        yaw = 0.005
        q = [0.0, 0.0, float(np.sin(yaw / 2)), float(np.cos(yaw / 2))]
        self.peg = builder.add_body(
            xform=[0.0008, -0.0006, 2 * DEPTH + 0.09] + q, key="peg")
        builder.add_shape_box(self.peg, hx=PEG, hy=PEG, hz=0.1, cfg=cfg)
        builder.add_joint_free(self.peg)
        builder.add_ground_plane()
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model,
                                          persistent_manifolds=True)
        self.solver = SolverMuJoCo(self.model, iterations=30,
                                   warm_start=False, contact_cap=0)
        self.state = self.solver.init_state(self.model.state())
        self.contacts = self.pipeline.contacts()
        self.sim_dt = 1.0 / 480.0
        self.substeps = 8
        self.time = 0.0
        viewer.set_model(self.model)

        solver, pipe, dt = self.solver, self.pipeline, self.sim_dt

        @jax.jit
        def frame(state, contacts):
            def sub(carry, _):
                s, c = carry
                c = pipe.collide(s, prev=c)
                return (solver.step(s, None, None, c, dt), c), None
            return jax.lax.scan(sub, (state, contacts), None,
                                length=self.substeps)[0]

        self._frame = frame

    def step(self):
        self.state, self.contacts = self._frame(self.state, self.contacts)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        q = np.asarray(self.state.body_q)[self.peg]
        assert np.isfinite(q).all()
        # seated: bottom of the peg below the socket mouth, centered
        assert q[2] < 2 * DEPTH + 0.02, f"peg jammed at z={q[2]:.4f}"
        assert abs(q[0]) < 0.01 and abs(q[1]) < 0.01, q[:2]
        # still upright (did not wedge diagonally)
        upright = 1.0 - 2.0 * (q[3] ** 2 + q[4] ** 2)
        assert upright > 0.98, upright
