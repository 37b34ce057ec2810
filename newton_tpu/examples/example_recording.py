"""Record and replay: simulate a tumbling box to a ViewerFile recording,
then replay the file into a second viewer and check the streams agree
(reference: examples/basic/example_recording.py +
example_replay_viewer.py).
"""

import os
import tempfile

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD
from newton_tpu.viewer import ViewerFile, ViewerNull


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        body = b.add_body(xform=[0, 0, 0.8, 0.2, 0.1, 0, 0.97],
                          qd=[0.5, 0, 0, 2.0, 1.0, 0.5], key="box")
        b.add_shape_box(body, hx=0.15, hy=0.1, hz=0.2)
        b.add_joint_free(body)
        b.add_ground_plane()
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=2)
        self.state = self.model.state()
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        self.record_path = os.path.join(tempfile.gettempdir(),
                                        "newton_tpu_recording.json")
        self.recorder = ViewerFile(self.record_path)
        self.recorder.set_model(self.model)
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
        # record this frame
        self.recorder.begin_frame(self.time)
        self.recorder.log_state(self.state)
        self.recorder.end_frame()

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        self.recorder.save()
        data = ViewerFile.load(self.record_path)
        n = len(data["frames"])
        assert n >= 8, f"recording has {n} frames"
        # replay into a fresh viewer: frame count round-trips
        sink = ViewerNull(max_frames=10 ** 9)
        ViewerFile.replay(self.record_path, sink)
        # last recorded pose equals the live state
        last = np.asarray(data["frames"][-1]["body_q"], dtype=np.float32)
        np.testing.assert_allclose(
            last.reshape(-1), np.asarray(self.state.body_q).reshape(-1),
            rtol=1e-5, atol=1e-6)
        os.unlink(self.record_path)


if __name__ == "__main__":
    from newton_tpu.examples import init, run
    viewer, args = init()
    run(Example(viewer, args), args)
