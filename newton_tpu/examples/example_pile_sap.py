"""512-hull pile on the segmented SAP dynamic broad phase (reference:
geometry/broad_phase_sap.py:410 — the scene class the sweep-and-prune
exists for). 512 convex octahedra rain into a pit; the precomputed pair
list is ~130k entries, far past any static-slot budget, so the pipeline
runs in dynamic mode with per-class sweep-and-prune candidate generation
(O(shapes x window) per step instead of O(pairs)) and reports zero
dropped pairs on `Contacts.broad_phase_dropped`."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD

N = 512


def _octa(r=0.05):
    v = np.array([[r, 0, 0], [-r, 0, 0], [0, r, 0], [0, -r, 0],
                  [0, 0, r], [0, 0, -r]], dtype=np.float64)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    return nt.Mesh(v, f.reshape(-1), compute_inertia=True)


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        rng = np.random.default_rng(11)
        builder = nt.ModelBuilder(gravity=-9.81)
        cfg = builder.default_shape_cfg.copy()
        cfg.mu = 0.5
        mesh = _octa()
        for i in range(N):
            x, y = rng.uniform(-0.8, 0.8, 2)
            z = 0.1 + 0.13 * (i // 64)
            bb = builder.add_body(
                xform=[float(x), float(y), float(z), 0, 0, 0, 1],
                key=f"hull_{i}")
            builder.add_shape_convex_hull(bb, mesh=mesh, cfg=cfg,
                                          key=f"hull_shape_{i}")
            builder.add_joint_free(bb, key=f"hull_free_{i}")
        builder.add_ground_plane()
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(
            self.model, mode="dynamic", broad_phase="sap",
            dynamic_pair_budget=4096, sap_window=24)
        self.solver = SolverXPBD(self.model, iterations=4)
        self.state = self.model.state()
        self.sim_dt = 1.0 / 120.0
        self.substeps = 2
        self.time = 0.0
        self.dropped = 0
        viewer.set_model(self.model)

        solver, pipe, dt = self.solver, self.pipeline, self.sim_dt

        @jax.jit
        def frame(state):
            def sub(carry, _):
                s, dropped = carry
                c = pipe.collide(s)
                return (solver.step(s, None, None, c, dt),
                        dropped + c.broad_phase_dropped), None
            (s, dropped), _ = jax.lax.scan(
                frame_sub := sub, (state, 0), None, length=self.substeps)
            return s, dropped

        self._frame = frame

    def step(self):
        self.state, dropped = self._frame(self.state)
        self.dropped += int(dropped)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        q = np.asarray(self.state.body_q)
        assert np.isfinite(q).all()
        assert q[:, 2].min() > -0.05, "hull fell through the ground"
        assert q[:, 2].max() < 2.0, "pile exploded"
        assert self.dropped == 0, (
            f"SAP budget clipped {self.dropped} overlapping pairs")
