"""Sparse quantized SDF textures + disk cache (geometry/sdf_texture.py,
geometry/sdf_cache.py; reference sdf_texture.py:126, _sdf_cache.py)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from newton_tpu.geometry.sdf import bake_mesh_sdf, sample_sdf_grid
from newton_tpu.geometry.sdf_cache import (
    cached_bake_mesh_sdf,
    cached_bake_texture_sdf,
    mesh_bake_key,
)
from newton_tpu.geometry.sdf_texture import (
    bake_texture_sdf,
    sample_texture_sdf,
)
from newton_tpu.geometry.types import Mesh


def _box_mesh(hx=0.5, hy=0.4, hz=0.3):
    v = np.array([[sx * hx, sy * hy, sz * hz]
                  for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                 dtype=np.float64)
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
    ], dtype=np.int32).reshape(-1)
    return Mesh(v, f, compute_inertia=False)


def test_texture_matches_analytic_box_sdf():
    mesh = _box_mesh()
    tex = bake_texture_sdf(mesh, resolution=64)
    # probe near the surface (where fine blocks must be active)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.6, 0.6, size=(256, 3))
    d = np.asarray(sample_texture_sdf(
        jnp.asarray(tex.block_index), jnp.asarray(tex.blocks),
        jnp.asarray(tex.block_scale), jnp.asarray(tex.block_offset),
        jnp.asarray(tex.coarse), jnp.asarray(tex.lower),
        jnp.asarray(tex.upper), jnp.asarray(pts)))
    # analytic box SDF
    q = np.abs(pts) - np.array([0.5, 0.4, 0.3])
    outside = np.linalg.norm(np.maximum(q, 0), axis=-1)
    inside = np.minimum(q.max(axis=-1), 0.0)
    ref = outside + inside
    near = np.abs(ref) < 0.1
    assert near.sum() > 20
    err = np.abs(d - ref)
    # fine-cell size is ~1.2/64 ~ 0.02; corner-distance error of the same
    # order plus quantization
    assert err[near].max() < 0.035, err[near].max()


def test_texture_is_sparse_and_smaller():
    mesh = _box_mesh()
    tex = bake_texture_sdf(mesh, resolution=96)
    B = tex.block_index.shape[0]
    n_active = int((tex.block_index >= 0).sum())
    assert 0 < n_active < B ** 3          # some blocks are far field
    dense_bytes = (B * 8 + 1) ** 3 * 4
    # uint8 quantization + culled far field: >3x smaller than dense f32
    assert tex.nbytes < dense_bytes / 3, (tex.nbytes, dense_bytes)


def test_texture_coarse_far_field_sign():
    mesh = _box_mesh()
    tex = bake_texture_sdf(mesh, resolution=64)
    far = np.array([[0.65, 0.65, 0.45], [-0.65, 0.0, 0.0]])
    d = np.asarray(sample_texture_sdf(
        jnp.asarray(tex.block_index), jnp.asarray(tex.blocks),
        jnp.asarray(tex.block_scale), jnp.asarray(tex.block_offset),
        jnp.asarray(tex.coarse), jnp.asarray(tex.lower),
        jnp.asarray(tex.upper), jnp.asarray(far)))
    assert (d > 0).all()                   # outside is positive everywhere


def test_disk_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("NEWTON_TPU_CACHE_DIR", str(tmp_path))
    mesh = _box_mesh()
    s1 = cached_bake_mesh_sdf(mesh, resolution=24)
    files = list(tmp_path.glob("*.npz"))
    assert len(files) == 1
    s2 = cached_bake_mesh_sdf(mesh, resolution=24)  # hit
    assert np.array_equal(s1.data, s2.data)
    t1 = cached_bake_texture_sdf(mesh, resolution=64)
    t2 = cached_bake_texture_sdf(mesh, resolution=64)
    assert np.array_equal(t1.blocks, t2.blocks)
    assert len(list(tmp_path.glob("*.npz"))) == 2


def test_cache_key_sensitivity():
    mesh = _box_mesh()
    k1 = mesh_bake_key(mesh.vertices, mesh.indices, resolution=24)
    k2 = mesh_bake_key(mesh.vertices, mesh.indices, resolution=32)
    k3 = mesh_bake_key(mesh.vertices * 1.01, mesh.indices, resolution=24)
    assert len({k1, k2, k3}) == 3


def test_highres_mesh_contact_via_texture():
    """End-to-end: ShapeConfig.sdf_max_resolution >= 48 routes mesh contact
    through the texture pool; a sphere rests on the mesh box top."""
    import jax
    import newton_tpu as nt
    from newton_tpu.sim.builder import ShapeConfig
    from newton_tpu.sim.collide import CollisionPipeline
    from newton_tpu.solvers import SolverXPBD

    mesh = _box_mesh(0.5, 0.5, 0.25)
    b = nt.ModelBuilder()
    cfg = ShapeConfig(sdf_max_resolution=64)
    b.add_shape_mesh(-1, mesh=mesh, cfg=cfg)        # static mesh box
    ball = b.add_body(xform=[0.0, 0.0, 1.0, 0, 0, 0, 1], mass=1.0)
    b.add_shape_sphere(ball, radius=0.1)
    b.add_joint_free(ball)
    m = b.finalize()
    assert int(np.asarray(m.structure.shape_sdf_tex_id)[0]) >= 0
    assert m.sdf_tex_blocks.shape[0] > 0

    pipe, solver = CollisionPipeline(m), SolverXPBD(m, iterations=2)
    s, ctrl, dt = m.state(), m.control(), 1 / 240.0

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, ctrl, pipe.collide(s), dt), None
        return jax.lax.scan(sub, s, None, length=4)[0]

    for _ in range(120):
        s = frame(s)
    z = float(s.body_q[0, 2])
    assert not np.isnan(np.asarray(s.body_q)).any()
    # rests on top face: z = 0.25 + 0.1, with texture-resolution tolerance
    assert abs(z - 0.35) < 0.04, z
