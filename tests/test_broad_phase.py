"""Runtime broad-phase tests (reference: tests/test_broad_phase.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import newton_tpu as nt
from newton_tpu.geometry.broad_phase import (
    BroadPhaseAllPairs,
    BroadPhaseExplicit,
    BroadPhaseSAP,
    compute_shape_aabbs,
)


@pytest.fixture(scope="module")
def scene():
    b = nt.ModelBuilder()
    for i in range(6):
        body = b.add_body(xform=[i * 3.0, 0, 0, 0, 0, 0, 1], mass=1.0)
        b.add_shape_sphere(body, radius=0.5)
        b.add_joint_free(body)
    # two overlapping spheres
    body = b.add_body(xform=[0.4, 0, 0, 0, 0, 0, 1], mass=1.0)
    b.add_shape_sphere(body, radius=0.5)
    b.add_joint_free(body)
    return b.finalize()


def overlapping(pairs, mask):
    return {tuple(p) for p, m in zip(np.asarray(pairs), np.asarray(mask)) if m}


def test_aabbs(scene):
    lo, hi, _ = compute_shape_aabbs(scene, scene.state())
    assert (np.asarray(hi) >= np.asarray(lo)).all()


def test_nxn_finds_overlap(scene):
    bp = BroadPhaseAllPairs(scene)
    pairs, mask = bp.launch(scene.state())
    got = overlapping(pairs, mask)
    assert (0, 6) in got
    assert (0, 1) not in got


def test_sap_matches_nxn(scene):
    s = scene.state()
    nxn = overlapping(*BroadPhaseAllPairs(scene).launch(s))
    sap = overlapping(*BroadPhaseSAP(scene, window=8).launch(s))
    assert nxn == sap


def test_explicit_masks(scene):
    bp = BroadPhaseExplicit(scene)
    pairs, mask = bp.launch(scene.state())
    got = overlapping(pairs, mask)
    assert (0, 6) in got
