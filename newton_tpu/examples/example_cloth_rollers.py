"""Cloth rollers: a fabric strip is hauled upward through the nip of two
counter-rotating kinematic drums, against gravity, by contact friction alone
(reference: newton/examples/cloth/example_cloth_rollers.py).

Exercises the moving-surface term of XPBD particle-shape friction: the
contact friction clamp is evaluated against the drum SURFACE velocity
(v + w x r of the shape's body), so a spinning shape transports cloth the
way a real roller feed does. Free fall would carry the strip down; the gate
asserts it rises at roughly the surface feed rate.
"""

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers.solver_xpbd import SolverXPBD

R = 0.12           # drum radius
FEED = 0.3         # nip surface speed, m/s (upward)
GAP = 0.010        # nip clearance between drum surfaces
RAD = 0.008        # cloth particle radius (strip thickness 2*RAD > GAP)


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder(gravity=-9.81)
        cfg = b.default_shape_cfg.copy()
        cfg.mu = 1.0

        w = FEED / R
        # axis along world y: rotate the local-z cylinder 90 deg about x
        rot_x90 = [np.sin(np.pi / 4), 0.0, 0.0, np.cos(np.pi / 4)]
        for side, wy in ((-1.0, -w), (1.0, w)):
            drum = b.add_body(
                xform=[side * (R + GAP / 2), 0.0, 0.5] + rot_x90,
                qd=np.array([0, 0, 0, 0.0, wy, 0.0]),
                kinematic=True, key=f"drum_{'LR'[side > 0]}")
            b.add_shape_cylinder(drum, radius=R, half_height=0.25, cfg=cfg)

        # vertical strip through the nip: local X -> world y (width),
        # local Y -> world z (length)
        rot_cloth = [0.5, 0.5, 0.5, 0.5]
        self.cloth = b.add_cloth_grid(
            pos=[0.0, -0.15, 0.0], rot=rot_cloth,
            dim_x=6, dim_y=24, cell_x=0.05, cell_y=0.025,
            mass=0.3, radius=RAD,
            tri_ke=500.0, tri_ka=500.0, tri_kd=10.0, edge_ke=0.5)
        b.particle_mu = 1.0

        self.model = b.finalize()
        self.pipeline = CollisionPipeline(self.model)
        self.solver = SolverXPBD(self.model, iterations=6)
        self.state = self.model.state()
        self.control = self.model.control()
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.time = 0.0
        self._z0 = float(np.mean(np.asarray(self.state.particle_q)[:, 2]))
        viewer.set_model(self.model)

        solver, pipe, control, dt = (self.solver, self.pipeline,
                                     self.control, self.sim_dt)

        @jax.jit
        def frame(state):
            def sub(s, _):
                return solver.step(s, None, control, pipe.collide(s),
                                   dt), None
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
        p = np.asarray(self.state.particle_q)
        assert np.isfinite(p).all()
        rise = float(np.mean(p[:, 2])) - self._z0
        # hauled upward at a substantial fraction of the feed rate
        # (free fall would make this strongly negative)
        assert rise > 0.3 * FEED * self.time, (
            f"strip not fed: rise {rise:.3f} m in {self.time:.2f} s")
        # strip stays in the nip plane
        assert np.all(np.abs(p[:, 0]) < 0.5)


if __name__ == "__main__":
    from newton_tpu.examples import init, run
    viewer, args = init()
    run(Example(viewer, args), args)
