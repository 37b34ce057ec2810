"""Y-junction cable harness: a trunk cable splits into two branches, all
linked by split-stiffness cable joints with rest-pose-anchored branch
angles; the harness swings from its root and keeps its Y shape
(reference: newton/examples/cable/example_cable_y_junction.py)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.solvers.solver_xpbd import SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder(gravity=-9.81)
        # trunk down from the anchor, then two branches at +-35 degrees
        pts = [[0.0, 0.0, 1.5]]
        for k in range(1, 4):                       # trunk points
            pts.append([0.0, 0.0, 1.5 - 0.15 * k])
        split = np.asarray(pts[-1])
        dirs = {"left": np.array([-0.57, 0.0, -0.82]),
                "right": np.array([0.57, 0.0, -0.82])}
        edges = [(0, 1), (1, 2), (2, 3)]
        for d in dirs.values():
            prev = 3
            for k in range(1, 4):
                pts.append((split + d * 0.15 * k).tolist())
                edges.append((prev, len(pts) - 1))
                prev = len(pts) - 1
        self.bodies = b.add_rod_graph(
            pts, edges, radius=0.015, joint="cable",
            bend_ke=8.0, bend_kd=0.3, stretch_ke=2.0e4, stretch_kd=1.0,
            key="harness")
        # pin the trunk root segment to the world
        b.add_joint_cable(-1, self.bodies[0],
                          xform_p=[0.0, 0.0, 1.5, 0, 0, 0, 1],
                          xform_c=[0.0, 0.0, -0.075, 0, 0, 0, 1],
                          stretch_stiffness=2.0e4, stretch_damping=1.0,
                          bend_stiffness=2.0, bend_damping=0.2, key="pin")
        self.model = b.finalize()
        self.solver = SolverXPBD(self.model, iterations=8)
        self.state = self.model.state()
        # side kick so the harness swings
        qd = np.asarray(self.state.body_qd).copy()
        qd[:, 1] = 0.8
        self.state = self.state.replace(body_qd=np.asarray(qd))
        self.sim_dt = 1.0 / 960.0
        self.substeps = 8
        self.time = 0.0
        viewer.set_model(self.model)

        solver, dt = self.solver, self.sim_dt

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, None, None, dt), None
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
        # still attached near the anchor
        assert np.linalg.norm(q[self.bodies[0], :3]
                              - [0, 0, 1.42]) < 0.3
        # branch tips stay separated (the Y did not collapse to a strand)
        tip_l, tip_r = self.bodies[-4], self.bodies[-1]
        sep = np.linalg.norm(q[tip_l, :3] - q[tip_r, :3])
        assert sep > 0.25, sep
