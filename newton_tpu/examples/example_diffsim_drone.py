"""Differentiable drone: optimize four rotor thrusts so a quadrotor lifts
off, translates to a waypoint, and hovers there (reference:
examples/diffsim/example_diffsim_drone.py — there a crazyflie USD with a
tape; here a parametric quadrotor whose per-rotor thrust schedule is
optimized by ``jax.grad`` straight through the rigid-body integrator).

Thrust enters as ``state.body_f`` — a world-frame wrench recomputed every
substep from the body orientation (rotors push along the body +z axis at
the four arm tips), exactly the force path the reference integrates.
"""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.math.quat import quat_rotate
from newton_tpu.solvers import SolverSemiImplicit

ARM = 0.12                       # rotor arm offset
WAYPOINT = jnp.array([0.6, 0.0, 0.8])
ROTORS = jnp.array([[ARM, 0, 0.02], [-ARM, 0, 0.02],
                    [0, ARM, 0.02], [0, -ARM, 0.02]])


class Example:
    def __init__(self, viewer, args=None):
        self.viewer = viewer
        b = nt.ModelBuilder(gravity=-9.81)
        body = b.add_body(xform=[0, 0, 0.2, 0, 0, 0, 1], key="drone")
        b.add_shape_box(body, hx=0.1, hy=0.1, hz=0.02,
                        cfg=nt.ShapeConfig(density=500.0))
        b.add_joint_free(body)
        self.model = b.finalize()
        self.solver = SolverSemiImplicit(self.model)
        self.sim_dt = 1.0 / 240.0
        self.substeps = 4
        self.horizon = 50
        self.time = 0.0
        viewer.set_model(self.model)

        model, solver, dt = self.model, self.solver, self.sim_dt
        control = model.control()
        mass = float(np.asarray(model.body_mass)[0])
        hover = mass * 9.81 / 4.0
        n_sub = self.horizon * self.substeps

        def wrench(state, thrust):
            q = state.body_q[0, 3:7]
            fz = quat_rotate(q, jnp.array([0.0, 0.0, 1.0]))
            f = fz[None, :] * thrust[:, None]          # (4, 3) world forces
            r = jax.vmap(lambda p: quat_rotate(q, p))(ROTORS)
            tau = jnp.sum(jnp.cross(r, f), axis=0)
            # rotor/aerodynamic drag: linear in velocity, damps attitude —
            # without it a bare rigid body tumbles and the loss landscape
            # is chaotic
            f_tot = jnp.sum(f, axis=0) - 0.08 * state.body_qd[0, 0:3]
            tau = tau - 0.02 * state.body_qd[0, 3:6]
            return jnp.concatenate([f_tot, tau])[None, :]

        def rollout(thrusts):
            # piecewise-constant thrust schedule: (K, 4) over the horizon
            s = model.state()
            K = thrusts.shape[0]

            def sub(s, i):
                t = thrusts[jnp.minimum(i * K // n_sub, K - 1)]
                s = s.replace(body_f=wrench(s, t))
                return solver.step(s, None, control, None, dt), s.body_q[0, :3]
            return jax.lax.scan(sub, s, jnp.arange(n_sub))

        def loss(thrusts):
            final, traj = rollout(thrusts)
            hover_err = jnp.sum((final.body_q[0, :3] - WAYPOINT) ** 2)
            vel_err = 0.05 * jnp.sum(final.body_qd[0] ** 2)
            return hover_err + vel_err

        self._loss_grad = jax.jit(jax.value_and_grad(loss))

        import optax
        thrusts = jnp.full((5, 4), hover)
        opt = optax.adam(0.05)
        opt_state = opt.init(thrusts)
        self.losses = []
        for _ in range(40):
            val, g = self._loss_grad(thrusts)
            self.losses.append(float(val))
            updates, opt_state = opt.update(g, opt_state)
            thrusts = optax.apply_updates(thrusts, updates)
        self.thrusts = thrusts

        self._wrench = jax.jit(wrench)
        self._step_with = jax.jit(
            lambda s, t: jax.lax.scan(
                lambda s, _: (solver.step(
                    s.replace(body_f=wrench(s, t)), None, control, None,
                    dt), None),
                s, None, length=self.substeps)[0])
        self.state = self.model.state()
        self._frame_i = 0

    def step(self):
        K = self.thrusts.shape[0]
        k = min(self._frame_i * K // self.horizon, K - 1)
        self.state = self._step_with(self.state, self.thrusts[k])
        self._frame_i += 1
        self.time += self.sim_dt * self.substeps

    def render(self):
        self.viewer.begin_frame(self.time)
        self.viewer.log_state(self.state)
        self.viewer.end_frame()

    def test_final(self):
        assert np.isfinite(np.asarray(self.state.body_q)).all()
        assert self.losses[-1] < 0.2 * self.losses[0], self.losses
        p = np.asarray(self.state.body_q[0, :3])
        if self._frame_i >= self.horizon:
            assert np.linalg.norm(p - np.asarray(WAYPOINT)) < 0.35, p


if __name__ == "__main__":
    from newton_tpu.examples import init, run
    viewer, args = init()
    run(Example(viewer, args), args)
