"""ModelBuilder unit tests (reference: tests/test_builder_replicate.py,
test_model.py — scene authoring, worlds, replicate, mass accumulation)."""

import numpy as np
import pytest

import newton_tpu as nt


def make_pendulum():
    b = nt.ModelBuilder()
    link = b.add_body(xform=[0.5, 0, 0, 0, 0, 0, 1], key="link")
    b.add_shape_box(link, hx=0.5, hy=0.05, hz=0.05)
    b.add_joint_revolute(parent=-1, child=link, axis="Y",
                         xform_c=[-0.5, 0, 0, 0, 0, 0, 1])
    return b


def test_counts_and_mass():
    b = make_pendulum()
    m = b.finalize()
    assert m.body_count == 1
    assert m.joint_count == 1
    assert m.joint_coord_count == 1
    assert m.joint_dof_count == 1
    # box 1.0 x 0.1 x 0.1 at density 1000 -> mass 10
    np.testing.assert_allclose(np.asarray(m.body_mass), [10.0], rtol=1e-5)
    # Iyy = m/12 (lx^2 + lz^2)
    np.testing.assert_allclose(np.asarray(m.body_inertia)[0, 1, 1],
                               10.0 / 12.0 * (1.0 + 0.01), rtol=1e-4)


def test_replicate_homogeneous():
    b = nt.ModelBuilder()
    b.add_ground_plane()
    b.replicate(make_pendulum(), 8)
    m = b.finalize()
    assert m.world_count == 8
    assert m.body_count == 8
    assert m.shape_count == 9  # 8 boxes + 1 global ground
    assert m.structure.homogeneous
    assert m.structure.counts_per_world["body"] == 1
    # candidate pairs: each box vs the global ground only
    assert m.structure.candidate_pairs.shape == (8, 2)
    # world indices correct
    np.testing.assert_array_equal(np.asarray(m.structure.body_world),
                                  np.arange(8))


def test_world_scoping_and_gravity():
    b = nt.ModelBuilder()
    b.begin_world(gravity=(0.0, 0.0, -1.0))
    b.add_body(mass=1.0)
    b.end_world()
    b.begin_world()
    b.add_body(mass=1.0)
    b.end_world()
    m = b.finalize()
    g = np.asarray(m.gravity)
    np.testing.assert_allclose(g[0], [0, 0, -1.0])
    np.testing.assert_allclose(g[1], [0, 0, -9.81], rtol=1e-5)


def test_collision_filtering_parent_child():
    b = nt.ModelBuilder()
    p = b.add_body()
    b.add_shape_sphere(p, radius=0.1)
    c = b.add_body(xform=[1, 0, 0, 0, 0, 0, 1])
    b.add_shape_sphere(c, radius=0.1)
    b.add_joint_revolute(parent=p, child=c, axis="Z")
    m = b.finalize()
    # parent-child pair filtered out
    assert m.structure.candidate_pairs.shape[0] == 0


def test_collision_groups():
    b = nt.ModelBuilder()
    cfg1 = nt.ShapeConfig(collision_group=1)
    cfg2 = nt.ShapeConfig(collision_group=2)
    x = b.add_body()
    b.add_shape_sphere(x, radius=0.1, cfg=cfg1)
    y = b.add_body(xform=[1, 0, 0, 0, 0, 0, 1])
    b.add_shape_sphere(y, radius=0.1, cfg=cfg2)
    m = b.finalize()
    assert m.structure.candidate_pairs.shape[0] == 0  # different groups

    b2 = nt.ModelBuilder()
    x = b2.add_body()
    b2.add_shape_sphere(x, radius=0.1, cfg=cfg1)
    y = b2.add_body(xform=[1, 0, 0, 0, 0, 0, 1])
    b2.add_shape_sphere(y, radius=0.1, cfg=cfg1)
    m2 = b2.finalize()
    assert m2.structure.candidate_pairs.shape[0] == 1  # same group


def test_cross_world_pairs_culled():
    b = nt.ModelBuilder()
    sub = nt.ModelBuilder()
    body = sub.add_body()
    sub.add_shape_sphere(body, radius=0.5)
    sub.add_joint_free(body)
    b.replicate(sub, 4)
    m = b.finalize()
    # spheres in different worlds never pair
    assert m.structure.candidate_pairs.shape[0] == 0


def test_joint_coord_layout():
    b = nt.ModelBuilder()
    root = b.add_body()
    b.add_joint_free(root)
    child = b.add_body(xform=[1, 0, 0, 0, 0, 0, 1])
    b.add_joint_ball(parent=root, child=child)
    leaf = b.add_body(xform=[2, 0, 0, 0, 0, 0, 1])
    b.add_joint_revolute(parent=child, child=leaf, axis="X")
    m = b.finalize()
    assert m.joint_coord_count == 7 + 4 + 1
    assert m.joint_dof_count == 6 + 3 + 1
    np.testing.assert_array_equal(m.joint_q_start, [0, 7, 11, 12])
    np.testing.assert_array_equal(m.joint_qd_start, [0, 6, 9, 10])
    # free joint initial coords match body pose
    np.testing.assert_allclose(np.asarray(m.joint_q0)[:7],
                               [0, 0, 0, 0, 0, 0, 1], atol=1e-6)


def test_particles_cloth():
    b = nt.ModelBuilder()
    b.add_cloth_grid(pos=(0, 0, 1), dim_x=4, dim_y=4, cell_x=0.1, cell_y=0.1,
                     mass=1.0, fix_top=True)
    m = b.finalize()
    assert m.particle_count == 25
    assert m.structure.tri_count == 32
    assert m.structure.edge_count > 0
    # fixed particles have zero inverse mass
    inv = np.asarray(m.particle_inv_mass)
    assert (inv == 0).sum() == 5


def test_soft_grid():
    b = nt.ModelBuilder()
    b.add_soft_grid(pos=(0, 0, 0), rot=None, vel=(0, 0, 0),
                    dim_x=2, dim_y=2, dim_z=2,
                    cell_x=0.1, cell_y=0.1, cell_z=0.1)
    m = b.finalize()
    assert m.particle_count == 27
    assert m.structure.tet_count == 40  # 5 tets x 8 cells


def test_equality_constraints():
    b = nt.ModelBuilder()
    x = b.add_body(mass=1.0)
    y = b.add_body(mass=1.0)
    b.add_equality_constraint(nt.EqType.CONNECT, body1=x, body2=y,
                              anchor=(0.5, 0, 0))
    j1 = b.add_joint_revolute(parent=-1, child=x, axis="Z")
    j2 = b.add_joint_revolute(parent=-1, child=y, axis="Z")
    b.add_constraint_mimic(j1, j2, multiplier=2.0)
    m = b.finalize()
    assert m.structure.eq_count == 2
    np.testing.assert_allclose(np.asarray(m.eq_polycoef)[1, 1], 2.0)


def test_custom_attributes():
    from newton_tpu.sim import AttributeFrequency, AttributeAssignment
    b = nt.ModelBuilder()
    for i in range(3):
        b.add_body(mass=1.0)
    b.add_custom_attribute("mjc:gainprm", AttributeFrequency.BODY,
                           shape=(2,), default=0.5)
    b.add_custom_values("mjc:gainprm", {1: [1.0, 2.0]})
    m = b.finalize()
    arr = np.asarray(m.custom["mjc:gainprm"])
    assert arr.shape == (3, 2)
    np.testing.assert_allclose(arr[0], [0.5, 0.5])
    np.testing.assert_allclose(arr[1], [1.0, 2.0])


def test_add_world_with_transform():
    sub = nt.ModelBuilder()
    body = sub.add_body(xform=[0, 0, 1, 0, 0, 0, 1])
    sub.add_shape_sphere(body, radius=0.1)
    sub.add_joint_free(body)
    b = nt.ModelBuilder()
    b.add_world(sub, xform=[5, 0, 0, 0, 0, 0, 1])
    m = b.finalize()
    np.testing.assert_allclose(np.asarray(m.body_q)[0, :3], [5, 0, 1], atol=1e-6)
    # free joint coords re-rooted too
    np.testing.assert_allclose(np.asarray(m.joint_q0)[:3], [5, 0, 1], atol=1e-6)


def test_state_control_contacts_factories():
    b = nt.ModelBuilder()
    b.replicate(make_pendulum(), 2)
    b.add_ground_plane()
    m = b.finalize()
    s = m.state()
    assert s.body_q.shape == (2, 7)
    assert s.joint_q.shape == (2,)
    c = m.control()
    assert c.joint_f.shape == (2,)
    k = m.contacts()
    assert k.rigid_contact_max == m.structure.rigid_contact_max
