"""Dahl bristle friction in SolverXPBD (reference: the VBD backend's Dahl
friction state, vbd/rigid_vbd_kernels.py; example_cable_dahl_hysteresis.py).

The bristle force builds with slip (df/dx = sigma (1 - f.t/f_c)), giving
pre-sliding compliance and hysteresis memory that memoryless Coulomb
friction cannot represent.
"""

import jax
import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers.solver_xpbd import SolverXPBD


def _box_on_ground(mu=0.5):
    b = nt.ModelBuilder()
    body = b.add_body(xform=[0, 0, 0.1, 0, 0, 0, 1])
    cfg = b.default_shape_cfg.copy()
    cfg.mu = mu
    b.add_shape_box(body, hx=0.1, hy=0.1, hz=0.1, cfg=cfg)
    b.add_joint_free(body)
    b.add_ground_plane(cfg=cfg)
    return b.finalize()


def _run(solver, pipe, state, frames, push=None):
    @jax.jit
    def frame(s, f):
        def sub(s, _):
            s = s.replace(body_f=s.body_f.at[0, 0].set(f))
            return solver.step(s, None, None, pipe.collide(s), 1 / 240.0), None
        return jax.lax.scan(sub, s, None, length=4)[0]

    xs = []
    for i in range(frames):
        f = 0.0 if push is None else push(i)
        state = frame(state, jnp.asarray(f, dtype=state.body_q.dtype))
        xs.append(float(state.body_q[0, 0]))
    return state, np.asarray(xs)


def test_dahl_slide_stops_and_keeps_state():
    m = _box_on_ground()
    pipe = CollisionPipeline(m)
    sol = SolverXPBD(m, iterations=4, friction_model="dahl",
                     dahl_sigma=5.0e4)
    s = sol.init_state(m.state())
    qd = np.zeros((1, 6))
    qd[0, 0] = 2.0
    s = s.replace(body_qd=jnp.asarray(qd, dtype=s.body_qd.dtype))
    s, xs = _run(sol, pipe, s, 90)
    assert np.isfinite(np.asarray(s.body_q)).all()
    assert abs(float(s.body_qd[0, 0])) < 0.05         # friction stopped it
    assert 0.1 < xs[-1] < 0.45                        # plausible stop distance
    f = np.asarray(s.custom["xpbd:dahl_f"])
    assert np.isfinite(f).all()
    assert (np.abs(f).sum(axis=1) > 1e-6).any()       # bristle memory persists


def test_dahl_presliding_holds_small_force():
    """A force below mu*N produces bounded creep, not free sliding."""
    m = _box_on_ground(mu=0.5)
    pipe = CollisionPipeline(m)
    sol = SolverXPBD(m, iterations=4, friction_model="dahl",
                     dahl_sigma=1.0e5)
    s = sol.init_state(m.state())
    # mass ~ 0.2^3 * 1000 = 8 kg -> mu*m*g ~ 39 N; push with 15 N
    s, xs = _run(sol, pipe, s, 60, push=lambda i: 15.0)
    # free mass under 15 N for 1 s would travel ~0.94 m; bristles hold it
    assert xs[-1] < 0.1, xs[-1]
    assert np.isfinite(np.asarray(s.body_q)).all()


def test_dahl_requires_init_state():
    m = _box_on_ground()
    pipe = CollisionPipeline(m)
    sol = SolverXPBD(m, friction_model="dahl")
    s = m.state()  # not initialized
    try:
        sol.step(s, None, None, jax.jit(pipe.collide)(s), 1 / 240.0)
    except ValueError as e:
        assert "init_state" in str(e)
    else:
        raise AssertionError("expected ValueError without init_state")
