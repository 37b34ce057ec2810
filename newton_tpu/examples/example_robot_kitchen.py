"""Franka arm in a full kitchen environment (43 bodies, 212 shapes,
appliance doors/knobs on passive joints) — the robot-in-large-scene KPI
shape (reference: Kitchen-G1 KPI, asv/benchmarks/simulation/
bench_mujoco.py:337). The arm waves through a sinusoidal joint-space sweep
while the scene's articulated cabinets respond passively.
"""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo

KITCHEN_XML = ("/opt/venv/lib/python3.12/site-packages/gymnasium_robotics/"
               "envs/assets/kitchen_franka/kitchen_assets/"
               "kitchen_env_model.xml")


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder()
        self.info = b.add_mjcf(KITCHEN_XML)
        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverMuJoCo(self.model, iterations=8)
        self.state = eval_fk(self.model, self.model.joint_q0,
                             self.model.joint_qd0, self.model.state())
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        viewer.set_model(self.model)

        au = self.model.structure.mjc_actuation
        mid = 0.5 * (au.ctrlrange[:, 0] + au.ctrlrange[:, 1])
        amp = 0.2 * (au.ctrlrange[:, 1] - au.ctrlrange[:, 0])
        lim = np.asarray(au.ctrllimited, bool)
        mid = np.where(lim, mid, 0.0)
        amp = np.where(lim, amp, 0.3)
        mid_j, amp_j = jnp.asarray(mid, jnp.float32), jnp.asarray(amp, jnp.float32)

        pipeline, solver, dt = self.pipeline, self.solver, self.sim_dt
        base_control = self.control
        A = au.n
        phase = jnp.linspace(0.0, 2.0 * jnp.pi, A, endpoint=False)

        @jax.jit
        def frame(state, t):
            ctrl = mid_j + amp_j * jnp.sin(2.0 * jnp.pi * 0.3 * t + phase)
            control = base_control.replace(
                custom=dict(base_control.custom, **{"mjc:ctrl": ctrl}))

            def sub(s, _):
                c = pipeline.collide(s)
                return solver.step(s, None, control, c, dt), None
            return jax.lax.scan(sub, state, None, length=self.substeps)[0]

        self._frame = frame

    def step(self):
        self.state = self._frame(self.state, jnp.float32(self.time))
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        q = np.asarray(self.state.joint_q)
        assert np.isfinite(q).all(), "non-finite kitchen coordinates"
        qd_all = np.asarray(self.state.joint_qd)
        assert np.abs(qd_all).max() < 50.0, "kitchen scene blew up"
        # passive appliance joints must stay within their limits (+slack);
        # coord<->dof indices align only for 1-coord-per-dof joints
        st = self.model.structure
        lo = np.asarray(self.model.joint_limit_lower)
        hi = np.asarray(self.model.joint_limit_upper)
        qs, ds = st.joint_q_start, st.joint_qd_start
        slack = 0.05
        for j in range(len(qs) - 1):
            nq, nd = qs[j + 1] - qs[j], ds[j + 1] - ds[j]
            if nq != nd:
                continue
            for k in range(nq):
                d, c = int(ds[j] + k), int(qs[j] + k)
                if lo[d] > -1e9 and hi[d] < 1e9:
                    assert lo[d] - slack <= q[c] <= hi[d] + slack, (
                        f"joint coord {c} out of limits: "
                        f"{q[c]} not in [{lo[d]}, {hi[d]}]")
