"""A rigid cube settles into a compliant (hydroelastic) pad to the exact
pressure-balance depth m g = k_eff A delta (reference: hydroelastic
contact examples; geometry/sdf_hydroelastic.py:240 HydroelasticSDF).
The pipeline integrates the linear pressure field p = k_eff * penetration
over per-sample Voronoi patch areas; XPBD consumes the aggregate as
compliant contact rows."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.geometry.types import Mesh
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD

KH = 5.0e5          # hydroelastic modulus of each body (Pa/m)
H = 0.1             # cube half extent


def _box_mesh(h):
    v = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                  for z in (-h, h)], np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5],
                  [0, 5, 1], [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4],
                  [1, 5, 7], [1, 7, 3]], np.int32)
    return Mesh(vertices=v, indices=f.reshape(-1))


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder(gravity=-9.81)
        cfg = b.default_shape_cfg.copy()
        cfg.kh = KH
        cfg.mu = 0.6
        b.add_shape_box(-1, xform=[0, 0, -0.1, 0, 0, 0, 1], hx=1.0, hy=1.0,
                        hz=0.1, cfg=cfg, key="pad")
        body = b.add_body(xform=[0, 0, H + 0.05, 0, 0, 0, 1])
        b.add_shape_mesh(body, mesh=_box_mesh(H), cfg=cfg, key="cube")
        b.add_joint_free(body)
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model, hydroelastic=True)
        self.solver = SolverXPBD(self.model, iterations=8)
        self.state = self.model.state()
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        pipeline, solver, ctrl, dt = (self.pipeline, self.solver,
                                      self.control, self.sim_dt)

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, ctrl, pipeline.collide(s), dt), None
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
        z = float(self.state.body_q[0, 2])
        mass = float(1.0 / np.asarray(self.model.body_inv_mass)[0])
        delta = mass * 9.81 / ((KH / 2) * (2 * H) ** 2)
        assert abs((H - z) - delta) < 0.3 * delta, (H - z, delta)
        assert np.isfinite(np.asarray(self.state.body_q)).all()
