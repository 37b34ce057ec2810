"""100-box pile with the dynamic-pair broad phase: the contact buffer is
O(S * k) pair budget instead of O(S^2) static slots, with an overflow
counter on Contacts (reference: runtime broad phase, collide.py:1391-1410,
broad_phase_sap.py:410; kitchen-scale scenes, bench_mujoco.py:337)."""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder()
        rng = np.random.default_rng(7)
        n_side = 4  # 4x4x? grid -> 96 boxes + ground
        h = 0.12
        count = 0
        for layer in range(6):
            for i in range(n_side):
                for j in range(n_side):
                    x = (i - n_side / 2) * 0.3 + rng.uniform(-0.02, 0.02)
                    y = (j - n_side / 2) * 0.3 + rng.uniform(-0.02, 0.02)
                    z = 0.3 + layer * 0.35
                    body = builder.add_body(
                        xform=[x, y, z, 0, 0, 0, 1], key=f"box_{count}")
                    builder.add_shape_box(body, hx=h, hy=h, hz=h)
                    builder.add_joint_free(body)
                    count += 1
        builder.add_ground_plane()
        self.model = builder.finalize()
        st = self.model.structure
        n_pairs = len(st.candidate_pairs)
        # dynamic mode: budgeted pair compaction instead of per-pair slots
        self.pipeline = CollisionPipeline(self.model, mode="dynamic",
                                          dynamic_pair_budget=8 * count)
        self.static_slots = st.rigid_contact_max
        self.dynamic_slots = self.pipeline.rigid_contact_max
        self.solver = SolverXPBD(self.model, iterations=4)
        self.state = self.model.state()
        self.control = self.model.control()
        self.sim_dt = 1.0 / 120.0
        self.substeps = 4
        self.time = 0.0
        self.dropped = 0
        viewer.set_model(self.model)

        pipeline, solver, control, dt = (self.pipeline, self.solver,
                                         self.control, self.sim_dt)

        @jax.jit
        def frame(state):
            def sub(carry, _):
                s, drop = carry
                c = pipeline.collide(s)
                return (solver.step(s, None, control, c, dt),
                        drop + c.broad_phase_dropped), None
            (s, drop), _ = jax.lax.scan(sub, (state, 0), None,
                                        length=self.substeps)
            return s, drop

        self._frame = frame
        print(f"boxes: {count}, candidate pairs: {n_pairs}, "
              f"static slots: {self.static_slots}, "
              f"dynamic slots: {self.dynamic_slots}")

    def step(self):
        self.state, drop = self._frame(self.state)
        self.dropped = int(drop)
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        bq = np.asarray(self.state.body_q)
        assert np.isfinite(bq).all(), "non-finite pose"
        assert (bq[:, 2] > 0.0).all(), "boxes fell through the ground"
        assert bq[:, 2].max() < 3.0, "pile exploded"
        assert self.dynamic_slots < self.static_slots, \
            "dynamic mode did not shrink the contact buffer"
