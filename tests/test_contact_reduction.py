"""Diverse contact reduction (geometry/contact_reduction.py)."""

import jax.numpy as jnp
import numpy as np

from newton_tpu.geometry.contact_reduction import reduce_contact_set


def _run(pos, nrm, depth, k, active=None):
    out = reduce_contact_set(jnp.asarray(pos), jnp.asarray(nrm),
                             jnp.asarray(depth), k, active=active)
    return [np.asarray(o) for o in out]


def test_deepest_always_first():
    K = 16
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(1, K, 3))
    nrm = np.tile([0.0, 0.0, 1.0], (1, K, 1))
    depth = rng.uniform(-0.01, 0.001, size=(1, K))
    depth[0, 7] = 0.05
    p, n, d = _run(pos, nrm, depth, 4)
    assert np.isclose(d[0, 0], depth[0, 7], atol=1e-6)


def test_spatial_spread_beats_cluster():
    # 12 deep candidates piled at the origin + 4 slightly shallower corner
    # candidates: plain top-4 keeps only the pile; the reducer must cover
    # the corners so a stacked box gets a stable manifold
    corners = np.array([[1, 1, 0], [1, -1, 0], [-1, 1, 0], [-1, -1, 0]],
                       float)
    pile = np.zeros((12, 3))
    pos = np.concatenate([pile, corners])[None]            # (1, 16, 3)
    nrm = np.tile([0.0, 0.0, 1.0], (1, 16, 1))
    depth = np.full((1, 16), 0.010)
    depth[0, 12:] = 0.008                                  # corners shallower
    p, n, d = _run(pos, nrm, depth, 4)
    # at least 3 of the 4 picks are corner points
    is_corner = (np.abs(p[0]).max(axis=-1) > 0.5).sum()
    assert is_corner >= 3, p[0]


def test_normal_diversity():
    # two clusters, same positions, opposing normals (an edge pinch):
    # both directions must be represented
    pos = np.zeros((1, 8, 3))
    nrm = np.tile([0.0, 0.0, 1.0], (1, 8, 1))
    nrm[0, 4:] = [1.0, 0.0, 0.0]
    depth = np.full((1, 8), 0.01)
    depth[0, 0] = 0.02
    p, n, d = _run(pos, nrm, depth, 2)
    dots = n[0] @ np.array([0.0, 0.0, 1.0])
    assert dots.max() > 0.9 and dots.min() < 0.1


def test_inactive_never_picked_over_active():
    pos = np.random.default_rng(1).normal(size=(1, 8, 3))
    nrm = np.tile([0.0, 0.0, 1.0], (1, 8, 1))
    depth = np.full((1, 8), -0.5)                          # far separated
    depth[0, 2] = 0.001
    depth[0, 5] = 0.0005
    active = depth > -0.01
    p, n, d = _run(pos, nrm, depth, 2, active=jnp.asarray(active))
    assert np.allclose(sorted(d[0]), [0.0005, 0.001], atol=1e-6)


def test_batched_shapes():
    B, K = 5, 12
    rng = np.random.default_rng(2)
    pos = rng.normal(size=(B, K, 3))
    nrm = rng.normal(size=(B, K, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    depth = rng.uniform(-0.1, 0.1, size=(B, K))
    p, n, d = _run(pos, nrm, depth, 6)
    assert p.shape == (B, 6, 3) and d.shape == (B, 6)
    assert np.allclose(d[:, 0], depth.max(axis=-1))
