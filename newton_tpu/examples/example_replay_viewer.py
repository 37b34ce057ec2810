"""Record-then-replay round trip (reference:
newton/examples/basic/example_replay_viewer.py — a ViewerFile recording is
played back through another viewer backend). A bouncing-sphere run is
recorded with ViewerFile, then replayed frame by frame into the active
viewer; the replay must contain every recorded frame and scalar."""

import os
import tempfile

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD
from newton_tpu.viewer import ViewerFile


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder(gravity=-9.81)
        body = builder.add_body(xform=[0, 0, 1.0, 0, 0, 0, 1], key="ball")
        cfg = builder.default_shape_cfg.copy()
        cfg.restitution = 0.6
        builder.add_shape_sphere(body, radius=0.1, cfg=cfg)
        builder.add_joint_free(body)
        builder.add_ground_plane()
        self.model = builder.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=4)
        self.state = self.model.state()
        self.sim_dt = 1.0 / 120.0
        self.time = 0.0
        self.record_path = os.path.join(tempfile.gettempdir(),
                                        "replay_example.json")
        self.recorder = ViewerFile(self.record_path)
        self.recorder.set_model(self.model)
        self.replayed = None
        viewer.set_model(self.model)

        solver, pipe, dt = self.solver, self.pipeline, self.sim_dt

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, None, pipe.collide(s), dt), None
            return jax.lax.scan(sub, state, None, length=2)[0]

        self._frame = frame

    def step(self):
        self.state = self._frame(self.state)
        self.time += self.sim_dt * 2
        # record the live run
        self.recorder.begin_frame(self.time)
        self.recorder.log_state(self.state)
        self.recorder.log_scalar("ball/z",
                                 float(np.asarray(self.state.body_q)[0, 2]))
        self.recorder.end_frame()

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        self.recorder.close()
        # replay the recording into a fresh file viewer (any backend works)
        sink = ViewerFile(self.record_path + ".replayed.json")
        data = ViewerFile.replay(self.record_path, sink)
        self.replayed = data
        assert len(data["frames"]) > 0
        zs = [f["scalars"]["ball/z"] for f in data["frames"]
              if "ball/z" in f.get("scalars", {})]
        assert len(zs) == len(data["frames"])
        # the recorded trajectory is a falling (then bouncing) ball
        assert zs[0] < 1.0 and min(zs) < 0.5
        assert np.isfinite(np.asarray(self.state.body_q)).all()
