"""Nut-and-bolt via SDF contact: a torus-mesh "nut" drops over a vertical
capsule "bolt shaft", threads down it, and comes to rest on the bolt head —
mesh-vertex-vs-analytic-SDF contact (reference:
examples/contacts/example_nut_bolt_sdf.py; our pipeline's sample-vs-SDF
classes replace the reference's SDF-vs-SDF narrow phase).
"""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.geometry.types import Mesh
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD


def torus_mesh(R=0.25, r=0.08, nu=24, nv=12):
    """Torus around +Z with major radius R, tube radius r."""
    verts, faces = [], []
    for i in range(nu):
        a = 2 * np.pi * i / nu
        ca, sa = np.cos(a), np.sin(a)
        for j in range(nv):
            b = 2 * np.pi * j / nv
            cb, sb = np.cos(b), np.sin(b)
            verts.append([(R + r * cb) * ca, (R + r * cb) * sa, r * sb])
    for i in range(nu):
        for j in range(nv):
            a0 = i * nv + j
            a1 = i * nv + (j + 1) % nv
            b0 = ((i + 1) % nu) * nv + j
            b1 = ((i + 1) % nu) * nv + (j + 1) % nv
            faces += [[a0, b0, b1], [a0, b1, a1]]
    return Mesh(np.array(verts, np.float64),
                np.array(faces, np.int32).reshape(-1))


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        # bolt: static shaft + wider head at the base
        b.add_shape_capsule(-1, xform=[0, 0, 0.55, 0, 0, 0, 1],
                            radius=0.1, half_height=0.45)
        b.add_shape_cylinder(-1, xform=[0, 0, 0.05, 0, 0, 0, 1],
                             radius=0.22, half_height=0.05)
        # nut: free torus mesh dropped above, slightly off-axis
        nut = b.add_body(xform=[0.03, 0.0, 1.4, 0, 0, 0, 1])
        b.add_shape_mesh(nut, mesh=torus_mesh())
        b.add_joint_free(nut)
        b.add_ground_plane()
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=4)
        self.state = self.model.state()
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        pipeline, solver, control, dt = (self.pipeline, self.solver,
                                         self.control, self.sim_dt)

        @jax.jit
        def frame(state):
            def sub(s, _):
                c = pipeline.collide(s)
                return solver.step(s, None, control, c, dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame

    def step(self):
        self.state = self._frame(self.state)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.log_scalar("nut_height",
                               float(self.state.body_q[0, 2]))
        self.viewer.end_frame()

    def test_final(self):
        bq = np.asarray(self.state.body_q)
        assert np.isfinite(bq).all()
        x, y, z = bq[0, 0], bq[0, 1], bq[0, 2]
        # the nut must stay on the bolt (threaded or leaning on the shaft
        # at the head); sliding clear of the 0.22-radius head means escape
        assert np.hypot(x, y) < 0.2, f"nut escaped the bolt ({x}, {y})"
        # and must have dropped down the shaft without tunneling through
        # the head (tube bottom >= head top ~0.1 => center >= ~0.1)
        assert 0.05 < z < 1.0, f"nut height {z}"
