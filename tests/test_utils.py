"""Utility tests: checkpointing, viewer recording, IK, benchmark harness,
determinism (reference: test_examples recording flows,
tests/determinism/test_solver_determinism.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.solvers import SolverXPBD
from newton_tpu.utils.checkpoint import load_state, save_state, state_digest
from newton_tpu.viewer import ViewerFile, ViewerNull


def pendulum():
    b = nt.ModelBuilder()
    link = b.add_body(xform=[0.5, 0, 0, 0, 0, 0, 1])
    b.add_shape_box(link, hx=0.5, hy=0.05, hz=0.05)
    b.add_joint_revolute(parent=-1, child=link, axis="Y",
                         xform_c=[-0.5, 0, 0, 0, 0, 0, 1])
    return b.finalize()


def test_checkpoint_roundtrip(tmp_path):
    m = pendulum()
    s = eval_fk(m, jnp.array([0.3]), jnp.array([0.1]), m.state())
    path = str(tmp_path / "state.npz")
    save_state(path, s)
    s2 = load_state(path, m.state())
    np.testing.assert_allclose(np.asarray(s2.body_q), np.asarray(s.body_q))
    assert state_digest(s) == state_digest(s2)


def test_determinism_bit_exact():
    """Two runs from the same initial state produce identical bits
    (the reference needs DeterministicMode + subprocess isolation for this;
    XLA gives it unconditionally)."""
    m = pendulum()
    solver = SolverXPBD(m, iterations=4)
    ctrl = m.control()

    @jax.jit
    def rollout(s):
        def sub(s, _):
            return solver.step(s, None, ctrl, None, 1 / 240.), None
        return jax.lax.scan(sub, s, None, length=50)[0]

    s0 = eval_fk(m, jnp.zeros(1), jnp.zeros(1), m.state())
    a = rollout(s0)
    b = rollout(s0)
    assert state_digest(a) == state_digest(b)


def test_viewer_file_record_replay(tmp_path):
    m = pendulum()
    path = str(tmp_path / "rec.json")
    v = ViewerFile(path)
    v.set_model(m)
    s = m.state()
    for i in range(3):
        v.begin_frame(i * 0.1)
        v.log_state(s)
        v.log_scalar("energy", float(i))
        v.end_frame()
    v.save()
    data = ViewerFile.load(path)
    assert len(data["frames"]) == 3
    assert data["header"]["body_count"] == 1
    null = ViewerNull()
    ViewerFile.replay(path, null)
    assert null.scalars["energy"] == [0.0, 1.0, 2.0]


def test_viewer_null_frame_limit():
    v = ViewerNull(max_frames=2)
    assert v.is_running()
    for t in (0.0, 0.1):
        v.begin_frame(t)
        v.end_frame()
    assert not v.is_running()


def test_ik_reaches_target():
    from newton_tpu.ik import IKObjectivePosition, IKSolver
    b = nt.ModelBuilder()
    l1 = b.add_body(xform=[0.5, 0, 0, 0, 0, 0, 1])
    b.add_shape_capsule(l1, radius=0.05, half_height=0.25)
    b.add_joint_revolute(parent=-1, child=l1, axis="Z",
                         xform_c=[-0.5, 0, 0, 0, 0, 0, 1])
    l2 = b.add_body(xform=[1.5, 0, 0, 0, 0, 0, 1])
    b.add_shape_capsule(l2, radius=0.05, half_height=0.25)
    b.add_joint_revolute(parent=l1, child=l2, axis="Z",
                         xform_p=[0.5, 0, 0, 0, 0, 0, 1],
                         xform_c=[-0.5, 0, 0, 0, 0, 0, 1])
    m = b.finalize()
    ik = IKSolver(m, [IKObjectivePosition(link=1, offset=(0.5, 0, 0))],
                  iterations=24, n_seeds=4)
    target = jnp.array([1.2, 0.8, 0.0])
    q = ik.solve(jnp.zeros(2), [target])
    s = eval_fk(m, q, jnp.zeros(2), m.state())
    from newton_tpu.math import transform_point
    tip = transform_point(s.body_q[1], jnp.array([0.5, 0, 0]))
    assert float(jnp.linalg.norm(tip - target)) < 0.02


def test_event_tracer():
    from newton_tpu.utils.benchmark import EventTracer, ScopedTimer
    tr = EventTracer(sync=False)
    with tr.scope("outer"):
        with tr.scope("inner"):
            pass
    rep = tr.report()
    assert "outer" in rep and "inner" in rep
    with ScopedTimer("t", print_=False) as t:
        pass
    assert t.elapsed >= 0


def test_ik_bfgs_method():
    from newton_tpu.ik import IKObjectivePosition, IKSolver
    b = nt.ModelBuilder()
    l1 = b.add_body(xform=[0.5, 0, 0, 0, 0, 0, 1])
    b.add_shape_capsule(l1, radius=0.05, half_height=0.25)
    b.add_joint_revolute(parent=-1, child=l1, axis="Z",
                         xform_c=[-0.5, 0, 0, 0, 0, 0, 1])
    m = b.finalize()
    ik = IKSolver(m, [IKObjectivePosition(link=0, offset=(0.5, 0, 0))],
                  iterations=40, method="bfgs")
    target = jnp.array([0.0, 1.0, 0.0])
    q = ik.solve(jnp.zeros(1), [target])
    np.testing.assert_allclose(float(q[0]) % (2 * np.pi), np.pi / 2,
                               atol=0.05)


def test_sleep_and_warm_start():
    from newton_tpu.sim.collide import CollisionPipeline
    from newton_tpu.solvers import SolverFeatherstone
    b = nt.ModelBuilder()
    b.add_mjcf("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/"
               "mujoco/assets/ant.xml")
    m = b.finalize()
    pipe = CollisionPipeline(m)
    solver = SolverFeatherstone(m, contact_iterations=4, warm_start=True,
                                sleep_threshold=0.05, sleep_steps=8)
    s = solver.init_state(eval_fk(m, m.joint_q0, m.joint_qd0, m.state()))
    assert "sleep:count:0" in s.custom
    assert "contact:lam:0" in s.custom
    ctrl = m.control()

    @jax.jit
    def frame(st):
        def sub(ss, _):
            return solver.step(ss, None, ctrl, pipe.collide(ss), 1 / 240.), None
        return jax.lax.scan(sub, st, None, length=4)[0]

    for _ in range(60):
        s = frame(s)
    assert np.isfinite(np.asarray(s.joint_q)).all()
    assert 0.3 < float(s.joint_q[2]) < 0.8


def test_viewer_usd_writer(tmp_path):
    from newton_tpu.viewer import ViewerUSD
    m = pendulum()
    path = str(tmp_path / "stage.usda")
    v = ViewerUSD(path)
    v.set_model(m)
    s = m.state()
    for i in range(2):
        v.begin_frame(i / 60.)
        v.log_state(s)
        v.end_frame()
    v.save()
    from newton_tpu.usd import parse_usda
    root = parse_usda(open(path).read())
    assert any(p.type_name == "Cube" for p in root.walk())


def test_validation_helpers():
    from newton_tpu.utils.validation import (
        check_state_valid, find_nonfinite_members, nan_sweep)
    m = pendulum()
    s = m.state()
    assert check_state_valid(s)["valid"]
    bad = s.replace(body_q=s.body_q.at[0, 0].set(jnp.nan))
    assert find_nonfinite_members(bad)
    assert not check_state_valid(bad)["valid"]
    try:
        nan_sweep(bad)
        assert False, "should have raised"
    except AssertionError:
        pass


def test_viewer_pick_and_gaussian_shapes():
    """Viewer picking raycast + gaussian splat shapes
    (reference: viewer/picking.py:17, geometry/types.py:2334 Gaussian)."""
    import numpy as np
    from newton_tpu.sim.articulation import eval_fk
    from newton_tpu.viewer import ViewerNull

    b = nt.ModelBuilder()
    body = b.add_body(xform=[0, 0, 1.0, 0, 0, 0, 1])
    b.add_shape_sphere(body, radius=0.5)
    b.add_joint_free(body)
    b.add_shape_gaussian(body, means=np.zeros((5, 3)),
                         scales=np.full((5, 3), 0.02))
    b.add_ground_plane()
    m = b.finalize()
    s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
    v = ViewerNull()
    v.set_model(m)
    sid, t = v.pick(s, [0, 0, 5.0], [0, 0, -1.0])
    assert sid == 0 and abs(t - 3.5) < 1e-3
    # miss the sphere, hit the plane
    sid2, t2 = v.pick(s, [3, 0, 5.0], [0, 0, -1.0])
    assert sid2 == 2 and abs(t2 - 5.0) < 1e-3


def test_ik_rotation_objective():
    """IK with a rotation objective: orient the last link of a 2-link arm
    (reference: ik_objectives.py rotation objective :875)."""
    import jax.numpy as jnp
    import numpy as np
    from newton_tpu.ik import IKObjectiveRotation, IKSolver
    from newton_tpu.math import quat_from_axis_angle
    from newton_tpu.sim.articulation import eval_fk

    b = nt.ModelBuilder(gravity=0.0)
    parent = -1
    for i in range(2):
        link = b.add_body(xform=[0.5 + i, 0, 1, 0, 0, 0, 1])
        b.add_shape_capsule(link, radius=0.04, half_height=0.45)
        b.add_joint_revolute(parent, link, axis="Y",
                             xform_p=([0, 0, 1, 0, 0, 0, 1] if i == 0
                                      else [0.5, 0, 0, 0, 0, 0, 1]),
                             xform_c=[-0.5, 0, 0, 0, 0, 0, 1])
        parent = link
    m = b.finalize()
    ik = IKSolver(m, [IKObjectiveRotation(link=1)], iterations=24,
                  n_seeds=4)
    # target: last link rotated 40 degrees about Y
    qt = quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]),
                              jnp.array(0.7))
    q = ik.solve(m.joint_q0, [qt[None]])
    s = eval_fk(m, q[0], m.joint_qd0, m.state())
    got = np.asarray(s.body_q[1, 3:7])
    tgt = np.asarray(qt)
    dot = abs(float((got * tgt).sum()))
    assert dot > 0.999, f"rotation objective not met: |<q,qt>|={dot}"
