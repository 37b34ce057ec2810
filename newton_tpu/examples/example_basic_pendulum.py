"""Single pendulum under XPBD (reference:
newton/examples/basic/example_basic_pendulum.py:20-137). The canonical
end-to-end slice: build -> finalize -> jitted substep loop -> envelope test.
"""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.solvers import SolverXPBD


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        builder = nt.ModelBuilder()
        link = builder.add_body(xform=[0.5, 0, 0, 0, 0, 0, 1], key="link")
        builder.add_shape_box(link, hx=0.5, hy=0.05, hz=0.05)
        builder.add_joint_revolute(parent=-1, child=link, axis="Y",
                                   xform_c=[-0.5, 0, 0, 0, 0, 0, 1],
                                   key="pivot")
        self.model = builder.finalize()
        self.solver = SolverXPBD(self.model, iterations=4)
        self.state = eval_fk(self.model, jnp.zeros(1), jnp.zeros(1),
                             self.model.state())
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        solver, control, dt = self.solver, self.control, self.sim_dt

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, control, None, dt), None
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
        # envelope assertions (reference example :115-137)
        bq = np.asarray(self.state.body_q)
        assert bq[0, 2] <= 0.02, f"pendulum above pivot plane: {bq[0, 2]}"
        assert bq[0, 2] >= -0.51
        d = np.linalg.norm(bq[0, :3])
        assert abs(d - 0.5) < 1e-2, f"anchor drift {d}"
