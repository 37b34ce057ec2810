"""MPR convex-convex penetration manifolds (geometry/mpr.py).

Covers the reference's mpr.py + multicontact.py contract: convex hulls
collide directly from support functions — no SDF bake — and the manifold
holds stacks stable (reference: newton/_src/geometry/mpr.py:1-635,
multicontact.py:118).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import newton_tpu as nt
from newton_tpu.geometry.mpr import convex_manifold, mpr_contact
from newton_tpu.geometry.types import Mesh
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD


def _box_verts(h):
    return np.array([[sx * h[0], sy * h[1], sz * h[2]]
                     for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                    dtype=np.float32)


def _X(p, q=(0, 0, 0, 1)):
    return jnp.asarray(np.array(list(p) + list(q), np.float32))[None]


def _box_mesh(h):
    v = _box_verts(h)
    # any triangulation; hull construction only needs the vertices
    faces = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                      [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                      [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
                     dtype=np.int32)
    return Mesh(vertices=v, indices=faces.reshape(-1))


def test_mpr_depth_normal_boxes():
    va = jnp.asarray(_box_verts([0.5] * 3))[None]
    hit, d, n, p = mpr_contact(va, _X([0, 0, 0]), va, _X([0, 0, 0.8]))
    assert bool(hit[0])
    np.testing.assert_allclose(float(d[0]), 0.2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-5)
    # separated: no hit, negative distance
    hit, d, _, _ = mpr_contact(va, _X([0, 0, 0]), va, _X([0, 0, 1.5]))
    assert not bool(hit[0]) and float(d[0]) < 0
    # offset overlap (general portal path)
    hit, d, n, _ = mpr_contact(va, _X([0, 0, 0]), va, _X([0.3, 0.2, 0.8]))
    assert bool(hit[0])
    np.testing.assert_allclose(float(d[0]), 0.2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-3)


def test_mpr_manifold_face_contact():
    va = jnp.asarray(_box_verts([0.5] * 3))[None]
    pos, nrm, dep = convex_manifold(va, _X([0, 0, 0]), va, _X([0, 0, 0.8]))
    pos = np.asarray(pos[0])
    # four distinct patch corners + center, all at the overlap midplane
    assert len({(round(x, 2), round(y, 2)) for x, y, _ in pos}) == 5
    np.testing.assert_allclose(pos[:, 2], 0.4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dep[0]), 0.2, atol=1e-4)


def test_convex_hull_stack_no_sdf():
    """approximate_meshes output stacks stably with NO baked SDF grids
    (the VERDICT acceptance test for the MPR path)."""
    b = nt.ModelBuilder()
    mesh = _box_mesh([0.25, 0.25, 0.25])
    zs = [0.25, 0.76, 1.27]
    for z in zs:
        body = b.add_body(xform=[0, 0, z, 0, 0, 0, 1])
        b.add_shape_mesh(body, mesh=mesh)
        b.add_joint_free(body)
    b.add_ground_plane()
    b.approximate_meshes()          # MESH -> CONVEX hulls
    m = b.finalize()
    # the point of the exercise: no SDF grids were baked
    assert m.sdf_grids.shape[0] == 0
    assert int(np.sum(m.structure.shape_type == 3)) == 0  # no MESH left

    pipe = CollisionPipeline(m)
    solver = SolverXPBD(m, iterations=4)
    s, ctrl, dt = m.state(), m.control(), 1.0 / 240.0

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, ctrl, pipe.collide(s), dt), None
        return jax.lax.scan(sub, s, None, length=4)[0]

    for _ in range(120):
        s = frame(s)
    z = np.asarray(s.body_q)[:, 2]
    assert np.isfinite(np.asarray(s.body_q)).all()
    # stack holds: boxes rest near their initial heights, in order
    np.testing.assert_allclose(z, zs, atol=0.08)
    vel = np.abs(np.asarray(s.body_qd)).max()
    assert vel < 0.5, f"stack still moving: {vel}"


def test_convex_box_pair_uses_mpr():
    """CONVEX vs BOX routes through the cc class (no bake, 5 slots)."""
    b = nt.ModelBuilder()
    body = b.add_body(xform=[0, 0, 0.8, 0, 0, 0, 1])
    b.add_shape_convex_hull(body, mesh=_box_mesh([0.3] * 3))
    b.add_joint_free(body)
    base = b.add_body(xform=[0, 0, 0.25, 0, 0, 0, 1])
    b.add_shape_box(base, hx=0.5, hy=0.5, hz=0.25)
    b.add_joint_free(base)
    b.add_ground_plane()
    m = b.finalize()
    assert m.sdf_grids.shape[0] == 0
    pipe = CollisionPipeline(m)
    assert any(pc.kind == "cc" for pc in pipe.mesh_classes)
    s = m.state()
    c = jax.jit(pipe.collide)(s)
    # hull bottom (z=0.5) vs box top (z=0.5): touching within margin
    mask = np.asarray(c.rigid_contact_mask)
    assert mask.any()
