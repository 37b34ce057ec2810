"""Binary USD (crate) reader/writer + deformable volumes + Mjc resolver.

(reference: newton imports binary stages via pxr; here the dependency-free
crate codec in usd/usdc.py must round-trip physics stages and feed the
same import pipeline as .usda text.)
"""

import numpy as np
import pytest

import newton_tpu as nt
from newton_tpu.usd.usdc import (_decode_ints, _encode_ints, _lz4_compress,
                                 _lz4_decompress, _wrap32, is_usdc,
                                 read_usdc, write_usdc)
from newton_tpu.utils.usda_parser import UsdaPrim, parse_usda


USDA_SCENE = """#usda 1.0
def Xform "World" {
    def Xform "BodyA" (
        prepend apiSchemas = ["PhysicsRigidBodyAPI", "PhysicsMassAPI"]
    ) {
        float physics:mass = 2.0
        double3 xformOp:translate = (0, 0, 1.0)
        uniform token[] xformOpOrder = ["xformOp:translate"]
        def Sphere "Col" (
            prepend apiSchemas = ["PhysicsCollisionAPI"]
        ) {
            double radius = 0.5
        }
    }
    def PhysicsRevoluteJoint "Hinge" {
        rel physics:body1 = </World/BodyA>
        token physics:axis = "Y"
        float mjc:armature = 0.25
    }
}
"""


def test_int_codec_roundtrip():
    for vals in ([0, 1, 2, 5, -1, 100000, 3], [], [0xFFFFFFFF - 1, 7],
                 list(range(300))):
        got = list(_decode_ints(_encode_ints(vals), len(vals)))
        assert got == [_wrap32(int(v)) for v in vals]


def test_lz4_roundtrip():
    data = bytes(range(256)) * 20
    assert _lz4_decompress(_lz4_compress(data), len(data) + 16) == data


def _tree_from_usda(text):
    return parse_usda(text)


def test_usdc_roundtrip_physics_stage(tmp_path):
    root = _tree_from_usda(USDA_SCENE)
    p = str(tmp_path / "scene.usdc")
    write_usdc(root, p)
    assert is_usdc(p)
    r2 = read_usdc(p)
    body = None
    for prim in r2.walk():
        if prim.name == "BodyA":
            body = prim
    assert body is not None
    assert "PhysicsRigidBodyAPI" in body.api_schemas
    assert abs(float(body.attrs["physics:mass"]) - 2.0) < 1e-6
    col = body.children[0]
    assert col.type_name == "Sphere"
    assert abs(float(col.attrs["radius"]) - 0.5) < 1e-6


def test_import_usdc_matches_usda(tmp_path):
    """The same stage imported from text and from crate builds the same
    model (bodies, shapes, joints, mass)."""
    b_text = nt.ModelBuilder()
    b_text.add_usd(USDA_SCENE)
    m_text = b_text.finalize()

    root = _tree_from_usda(USDA_SCENE)
    p = str(tmp_path / "scene.usdc")
    write_usdc(root, p)
    b_bin = nt.ModelBuilder()
    b_bin.add_usd(p)
    m_bin = b_bin.finalize()

    assert m_bin.body_count == m_text.body_count
    assert m_bin.shape_count == m_text.shape_count
    assert m_bin.structure.joint_count == m_text.structure.joint_count
    np.testing.assert_allclose(np.asarray(m_bin.body_mass),
                               np.asarray(m_text.body_mass), rtol=1e-5)
    # mjc:armature flowed through the Mjc schema resolver in both paths
    arm = np.asarray(m_bin.joint_armature)
    assert (arm > 0.2).any(), f"mjc:armature not applied: {arm}"


def test_deformable_volume_import():
    """TetMesh prims become FEM soft bodies (reference:
    import_usd_deformable_volume.py)."""
    usda = """#usda 1.0
def TetMesh "Blob" {
    point3f[] points = [(0,0,0), (1,0,0), (0,1,0), (0,0,1), (1,1,1)]
    int[] tetVertexIndices = [0, 1, 2, 3, 4, 2, 1, 3]
    float physxDeformable:youngsModulus = 50000
}
"""
    b = nt.ModelBuilder()
    out = b.add_usd(usda)
    m = b.finalize()
    assert m.particle_count == 5
    assert len(m.tet_indices) == 2
    assert out["soft"]
    # particle masses accumulated from tet volumes
    assert float(np.asarray(m.particle_mass).sum()) > 0
