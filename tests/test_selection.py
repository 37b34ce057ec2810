"""ArticulationView tests (reference: tests for utils/selection.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.utils.selection import ArticulationView, match_labels


@pytest.fixture(scope="module")
def scene():
    robot = nt.ModelBuilder()
    root = robot.add_body(xform=[0, 0, 1.0, 0, 0, 0, 1], key="base")
    robot.add_shape_sphere(root, radius=0.2)
    robot.add_joint_free(root)
    arm = robot.add_body(xform=[0.5, 0, 1.0, 0, 0, 0, 1], key="arm")
    robot.add_shape_capsule(arm, radius=0.05, half_height=0.2)
    robot.add_joint_revolute(parent=root, child=arm, axis="Z",
                             xform_p=[0.25, 0, 0, 0, 0, 0, 1],
                             xform_c=[-0.25, 0, 0, 0, 0, 0, 1])
    b = nt.ModelBuilder()
    b.replicate(robot, 4)
    return b.finalize()


def test_match_labels():
    keys = ["world_0/robot", "world_1/robot", "other"]
    assert match_labels(keys, "*robot") == [0, 1]
    assert match_labels(keys, [0, 2]) == [0, 2]
    assert match_labels(keys, "other") == [2]


def test_view_shapes(scene):
    v = ArticulationView(scene, "*")
    assert v.count == 4
    assert v.joint_dof_count == 7
    assert v.joint_coord_count == 8
    assert v.link_count == 2


def test_dof_get_set(scene):
    v = ArticulationView(scene, "*")
    s = scene.state()
    q = v.get_dof_positions(s)
    assert q.shape == (4, 8)
    q2 = q.at[:, 7].set(jnp.arange(4.0))
    s2 = v.set_dof_positions(s, q2)
    np.testing.assert_allclose(np.asarray(v.get_dof_positions(s2))[:, 7],
                               [0, 1, 2, 3])
    # masked set only touches selected envs
    q3 = q2.at[:, 7].set(9.0)
    s3 = v.set_dof_positions(s2, q3, mask=jnp.array([True, False, True, False]))
    np.testing.assert_allclose(np.asarray(v.get_dof_positions(s3))[:, 7],
                               [9, 1, 9, 3])


def test_root_transforms_free(scene):
    v = ArticulationView(scene, "*")
    s = eval_fk(scene, scene.joint_q0, scene.joint_qd0, scene.state())
    roots = v.get_root_transforms(s)
    assert roots.shape == (4, 7)
    np.testing.assert_allclose(np.asarray(roots)[:, 2], 1.0, atol=1e-6)
    lifted = roots.at[:, 2].set(2.5)
    s2 = v.set_root_transforms(s, lifted)
    s2 = v.eval_fk(s2)
    np.testing.assert_allclose(np.asarray(s2.body_q)[v.root_body, 2], 2.5,
                               atol=1e-5)


def test_link_transforms_and_velocities(scene):
    v = ArticulationView(scene, "*")
    s = eval_fk(scene, scene.joint_q0, scene.joint_qd0, scene.state())
    lt = v.get_link_transforms(s)
    assert lt.shape == (4, 2, 7)
    lv = v.get_link_velocities(s)
    assert lv.shape == (4, 2, 6)


def test_get_attribute_frequencies(scene):
    v = ArticulationView(scene, "*")
    arm = v.get_attribute("joint_armature", scene)
    assert arm.shape == (4, 7)
    mass = v.get_attribute("body_mass", scene)
    assert mass.shape == (4, 2)


def test_dof_limits(scene):
    v = ArticulationView(scene, "*")
    lo, hi = v.get_dof_limits()
    assert lo.shape == (4, 7)


def test_view_dynamics_and_gains():
    """Per-view mass matrix / Jacobian / inverse dynamics and gain access
    (reference: selection.py:1755-1925, :1990-2030), validated against the
    analytic horizontal-rod pendulum (M = mL^2/3, tau = mgL/2)."""
    import numpy as np
    from newton_tpu.sim.articulation import eval_fk
    from newton_tpu.utils.selection import ArticulationView

    sub = nt.ModelBuilder()
    link = sub.add_body(xform=[0.5, 0, 0, 0, 0, 0, 1])
    sub.add_shape_box(link, hx=0.5, hy=0.05, hz=0.05)
    sub.add_joint_revolute(parent=-1, child=link, axis="Y",
                           xform_c=[-0.5, 0, 0, 0, 0, 0, 1], armature=0.0)
    b = nt.ModelBuilder()
    b.replicate(sub, 4)
    m = b.finalize()
    s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
    view = ArticulationView(m, "*")
    M = view.eval_mass_matrix(s)
    assert M.shape == (4, 1, 1)
    np.testing.assert_allclose(np.asarray(M)[:, 0, 0], 10 / 3, rtol=0.02)
    assert view.eval_jacobian(s).shape == (4, 1, 6, 1)
    tau = view.eval_inverse_dynamics(s)
    np.testing.assert_allclose(np.abs(np.asarray(tau)[:, 0]), 49.05,
                               rtol=0.02)
    m2 = view.set_gains(kp=100.0, kd=5.0)
    kp, kd = view.get_gains()
    assert (np.asarray(kp) == 100).all() and (np.asarray(kd) == 5).all()
