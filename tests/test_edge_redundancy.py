"""Edge-redundancy culling (geometry/edge_redundancy.py).

Mirrors the intent of reference tests/test_edge_redundancy.py: coplanar
interior edges fail the dihedral filter, sharp cube rims survive, and a
redundant parallel edge right next to a sharp one is absorbed by its box.
"""

import numpy as np
import pytest

from newton_tpu.geometry.edge_redundancy import (
    collision_edges,
    find_redundant_edges,
    mesh_edge_features,
    resolve_edge_removals,
)


def _box_mesh(hx=1.0, hy=1.0, hz=1.0):
    v = np.array([[sx * hx, sy * hy, sz * hz]
                  for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                 dtype=np.float64)
    f = np.array([
        [0, 1, 3], [0, 3, 2],      # -x
        [4, 6, 7], [4, 7, 5],      # +x
        [0, 4, 5], [0, 5, 1],      # -y
        [2, 3, 7], [2, 7, 6],      # +y
        [0, 2, 6], [0, 6, 4],      # -z
        [1, 5, 7], [1, 7, 3],      # +z
    ], dtype=np.int32)
    return v, f.reshape(-1)


def test_edge_features_box():
    v, f = _box_mesh()
    feats = mesh_edge_features(v, f)
    assert len(feats.edges) == 18                  # 12 rim + 6 face diagonals
    assert (feats.face_count == 2).all()           # closed manifold
    sharp = feats.dihedral > np.deg2rad(45.0)
    assert sharp.sum() == 12                       # rims are 90 degrees
    flat = feats.dihedral < np.deg2rad(1.0)
    assert flat.sum() == 6                         # diagonals are coplanar


def test_collision_edges_culls_coplanar():
    v, f = _box_mesh()
    ce = collision_edges(v, f)
    assert len(ce) == 12                           # only the rims survive


def test_boundary_edges_always_survive():
    # single quad (two triangles): 4 boundary edges + 1 coplanar diagonal
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
    f = np.array([0, 1, 2, 0, 2, 3], np.int32)
    ce = collision_edges(v, f)
    feats = mesh_edge_features(v, f)
    assert (feats.face_count == 1).sum() == 4
    assert len(ce) == 4                            # diagonal culled, rim kept


def test_box_absorption_removes_parallel_sliver():
    # a strip folded twice along two nearly-coincident parallel lines
    # (x = 0 and x = 0.02): both fold edges have moderate dihedral angles
    # (10 and 15 deg — absorbable), and each lies inside the other's
    # oriented box, so one is absorbed and greedily removed
    z1 = 0.02 * np.tan(np.deg2rad(10.0))
    z2 = z1 + 0.98 * np.tan(np.deg2rad(25.0))
    xs = [-1.0, 0.0, 0.02, 1.0]
    zs = [0.0, 0.0, z1, z2]
    v = np.array([[x, y, z] for x, z in zip(xs, zs) for y in (0.0, 1.0)])
    f = []
    for c in range(3):                       # quad column c: verts 2c..2c+3
        a = 2 * c
        f += [[a, a + 2, a + 3], [a, a + 3, a + 1]]
    f = np.asarray(f, np.int32).reshape(-1)
    res = find_redundant_edges(v, f,
                               half_normal=0.05, half_lateral=0.1,
                               lower_angle_threshold_rad=np.deg2rad(5.0),
                               upper_angle_threshold_rad=np.deg2rad(80.0))
    assert len(res.edge_indices) == 2        # the two fold lines
    assert res.candidate_for_removal.any()
    resolution = resolve_edge_removals(res)
    assert resolution.to_remove.sum() == 1
    assert resolution.kept.sum() == 1
    assert not (resolution.to_remove & resolution.kept).any()
    # end-to-end: collision_edges keeps boundary(8) + one fold
    ce = collision_edges(v, f, half_normal=0.05, half_lateral=0.1,
                         upper_angle_threshold_rad=np.deg2rad(80.0))
    feats = mesh_edge_features(v, f)
    n_boundary = int((feats.face_count == 1).sum())
    assert len(ce) == n_boundary + 1


def test_sharp_edges_never_absorbed():
    v, f = _box_mesh()
    res = find_redundant_edges(v, f, half_normal=10.0, half_lateral=10.0,
                               upper_angle_threshold_rad=np.deg2rad(60.0))
    # every rim is 90deg >= upper threshold: giant boxes still absorb nothing
    assert not res.candidate_for_removal.any()


def test_builder_mesh_samples_cover_feature_edges():
    # finalize a model with a box MESH: the rim midpoints must appear in the
    # baked sample points (seeded FPS), proving the wiring into the builder
    from newton_tpu.geometry.types import Mesh
    from newton_tpu.sim.builder import ModelBuilder

    v, f = _box_mesh(0.5, 0.3, 0.2)
    b = ModelBuilder()
    body = b.add_body(mass=1.0)
    b.add_shape_mesh(body, mesh=Mesh(v, f))
    b.add_ground_plane()
    model = b.finalize()
    pts = np.asarray(model.shape_sample_points)[0]         # (K, 3)
    # corners of the box are endpoints of feature edges -> must be sampled
    corners = v
    d = np.linalg.norm(pts[:, None, :] - corners[None], axis=-1).min(0)
    assert (d < 1e-6).all(), d
