"""1000:1 mass-ratio stack under Kamino's PADMM (reference:
kamino/_src/solvers/padmm.py — the hard-contact regime the proximal ADMM
with exact Cholesky sub-solves exists for). An 800 kg block rests on a
0.8 kg box: the diagonally-relaxed PGS sweep stalls here (the light box
gets crushed to the floor); PADMM holds both at their rest heights."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverKamino

H = 0.1


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=-9.81)
        light = builder.default_shape_cfg.copy()
        light.density = 100.0
        heavy = builder.default_shape_cfg.copy()
        heavy.density = 100000.0
        self.light = builder.add_body(xform=[0, 0, H, 0, 0, 0, 1],
                                      key="light")
        builder.add_shape_box(self.light, hx=H, hy=H, hz=H, cfg=light)
        builder.add_joint_free(self.light)
        self.heavy = builder.add_body(xform=[0, 0, 3 * H * 1.003, 0, 0, 0, 1],
                                      key="heavy")
        builder.add_shape_box(self.heavy, hx=H, hy=H, hz=H, cfg=heavy)
        builder.add_joint_free(self.heavy)
        builder.add_ground_plane()
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model,
                                          persistent_manifolds=True)
        self.solver = SolverKamino(self.model, iterations=32, contact_cap=0)
        self.state = self.solver.init_state(self.model.state())
        self.contacts = self.pipeline.contacts()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
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
        q = np.asarray(self.state.body_q)
        assert np.isfinite(q).all()
        assert abs(q[self.light, 2] - H) < 0.01, (
            f"light box crushed: z={q[self.light, 2]:.4f}")
        assert abs(q[self.heavy, 2] - 3 * H) < 0.012, (
            f"heavy box sank: z={q[self.heavy, 2]:.4f}")
