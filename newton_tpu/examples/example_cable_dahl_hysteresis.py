"""Dahl friction hysteresis on a dragged cable: a chain lying on the ground
is pulled forward and back by a kinematic handle; bristle friction makes
the tail lag with a hysteresis loop instead of retracing its path
(reference: newton/examples/vbd/example_cable_dahl_hysteresis.py — same
physics, XPBD cables + Dahl bristle contacts here)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.builder import np_transform
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers.solver_xpbd import SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=-9.81)
        cfg = builder.default_shape_cfg.copy()
        cfg.mu = 0.6
        # kinematic handle sliding along +x then back
        self.handle = builder.add_body(
            xform=np_transform(np.array([-0.05, 0.0, 0.035])),
            qd=np.array([0.4, 0, 0, 0, 0, 0]), kinematic=True, key="handle")
        builder.add_shape_box(self.handle, hx=0.03, hy=0.03, hz=0.03,
                              cfg=cfg, key="handle_s")
        # cable lying on the ground behind the handle
        self.bodies = builder.add_rod(
            [0.0, 0.0, 0.03], [0.8, 0.0, 0.03], segments=10, radius=0.025,
            joint="cable", bend_ke=2.0, bend_kd=0.05,
            stretch_ke=2.0e4, stretch_kd=1.0, root_joint="free", key="cable")
        # hitch anchors carry the rod's +x material tangent (local +Z -> +x)
        q_tan = np.array([0.0, np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4)])
        builder.add_joint_cable(
            self.handle, self.bodies[0],
            xform_p=np_transform(np.array([0.03, 0.0, 0.0]), q_tan),
            xform_c=np_transform(np.array([0.0, 0.0, -0.04])),
            stretch_stiffness=2.0e4, stretch_damping=1.0,
            bend_stiffness=1.0, bend_damping=0.05, key="hitch")
        builder.add_ground_plane(cfg=cfg)
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=8,
                                 friction_model="dahl", dahl_sigma=5.0e4)
        # builder poses are already consistent; eval_fk would weld the
        # chain onto the hitch anchors instead
        self.state = self.solver.init_state(self.model.state())
        self.sim_dt = 1.0 / 480.0
        self.substeps = 8
        self.time = 0.0
        self.tail_track = []
        viewer.set_model(self.model)

        solver, pipe, dt = self.solver, self.pipeline, self.sim_dt

        @jax.jit
        def frame(state, hv):
            def sub(s, _):
                s = s.replace(body_qd=s.body_qd.at[self.handle, 0].set(hv))
                return solver.step(s, None, None, pipe.collide(s), dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame

    def step(self):
        # triangle-wave handle velocity: forward 0.5 s, back 0.5 s
        phase = (self.time % 1.0)
        hv = 0.4 if phase < 0.5 else -0.4
        self.state = self._frame(self.state, hv)
        self.time += self.sim_dt * self.substeps
        self.tail_track.append(float(self.state.body_q[self.bodies[-1], 0]))

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        q = np.asarray(self.state.body_q)
        assert np.isfinite(q).all()
        tail = np.asarray(self.tail_track)
        # the tail moved (drag transmitted), but less than the handle's
        # 0.2 m sweep (friction hysteresis absorbs motion)
        assert tail.max() - tail.min() > 0.005, tail
        assert tail.max() - tail.min() < 0.2
        # bristle state is alive
        f = np.asarray(self.state.custom["xpbd:dahl_f"])
        assert np.isfinite(f).all()
