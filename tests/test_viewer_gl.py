"""ViewerGL logic tests (offscreen — no GL context on CI hosts).

Covers the camera math, geometry grouping/tessellation, instance-matrix
assembly and the picking drag spring (reference viewer_gl.py + picking.py).
"""

import jax.numpy as jnp
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.viewer.viewer_gl import (OrbitCamera, ViewerGL,
                                         _transform_matrix, shape_geometry)


def _scene():
    b = nt.ModelBuilder()
    body = b.add_body(xform=[0, 0, 1.0, 0, 0, 0, 1])
    b.add_shape_sphere(body, radius=0.5)
    b.add_joint_free(body)
    body2 = b.add_body(xform=[1.5, 0, 0.25, 0, 0, 0, 1])
    b.add_shape_box(body2, hx=0.25, hy=0.25, hz=0.25)
    b.add_joint_free(body2)
    b.add_ground_plane()
    return b.finalize()


def test_tessellation_all_primitives():
    m = _scene()
    for s in range(m.shape_count):
        v, n, i = shape_geometry(m, s)
        assert len(v) == len(n) and len(i) % 3 == 0
        assert np.isfinite(v).all()
        # normals unit-ish
        assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-3)


def test_camera_view_ray():
    cam = OrbitCamera()
    cam.target = np.asarray([0, 0, 1.0], np.float32)
    # the center pixel's ray points from the eye at the target
    o, d = cam.ray(400, 300, 800, 600)
    to_target = cam.target - o
    to_target /= np.linalg.norm(to_target)
    assert np.dot(d, to_target) > 0.999
    # view matrix maps the eye to the origin
    V = cam.view()
    eye_h = V @ np.append(cam.eye(), 1.0)
    assert np.allclose(eye_h[:3], 0.0, atol=1e-5)


def test_instance_matrices_and_groups():
    m = _scene()
    v = ViewerGL(offscreen=True)
    v.set_model(m)
    s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
    v.log_state(s)
    assert len(v._groups) == 3          # sphere, box, plane
    for g in v._groups:
        mats = v.instance_matrices(g)
        assert mats.shape == (len(g["shapes"]), 4, 4)
    # sphere instance sits at the body position
    sph = next(g for g in v._groups if len(g["verts"]) > 100)
    M = v.instance_matrices(sph)[0]
    np.testing.assert_allclose(M[:3, 3], [0, 0, 1.0], atol=1e-6)


def test_pick_spring_moves_body():
    m = _scene()
    v = ViewerGL(offscreen=True)
    v.set_model(m)
    s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
    v.log_state(s)
    # pick the sphere from above and drag the target sideways
    origin = np.asarray([0, 0, 5.0])
    direction = np.asarray([0, 0, -1.0])
    sidx, t = v.pick(s, origin, direction)
    assert sidx == 0
    v.start_pick(sidx, origin, direction, t)
    v._pick["target"] = np.asarray([1.0, 0, 1.5])
    s2 = v.apply_forces(s)
    vel = np.asarray(s2.body_qd)[0, 0:3]
    assert vel[0] > 0.01 and vel[2] > 0.01     # pulled toward the target
    # transform matrix correctness on a rotated transform
    q = np.asarray([0, 0, np.sin(0.3), np.cos(0.3)])
    X = np.concatenate([[1, 2, 3], q])
    M = _transform_matrix(X)
    p = M[:3, :3] @ np.asarray([1.0, 0, 0]) + M[:3, 3]
    from newton_tpu.core.host_math import np_transform_point
    np.testing.assert_allclose(p, np_transform_point(X, [1.0, 0, 0]),
                               atol=1e-6)


def test_gl_init_fails_loudly_headless():
    import pytest
    with pytest.raises(RuntimeError, match="display|GLFW"):
        ViewerGL()    # no DISPLAY on CI


def test_gui_panel_compose_and_layout():
    """GUI panel text composition + quad layout are pure and headless
    (reference: viewer_gui.py:33 panel content)."""
    from newton_tpu.viewer.viewer_gui import GuiPanel, layout_text

    p = GuiPanel()
    p.log_scalar("energy", 12.5)
    p.log_scalar("energy", 13.0)          # replaces, doesn't duplicate
    lines = p.compose(paused=True, frame=42, fps=60.0, world_filter=2,
                      world_count=8, picked_shape=3, sim_time=0.175)
    text = "\n".join(lines)
    assert "PAUSED" in text and "frame 42" in text
    assert "world: 2/8" in text and "picked shape 3" in text
    assert text.count("energy") == 1 and "13" in text
    assert "SPACE" in text                # key help present

    quads, rect = layout_text(lines, gw=7, gh=13)
    n_chars = sum(len(l.replace(" ", "")) for l in lines)
    assert quads.shape == (n_chars, 6, 4)
    x, y, w, h = rect
    assert w > 0 and h >= len(lines) * 13
    # all glyph quads inside the backdrop
    assert quads[..., 0].min() >= x and quads[..., 1].max() <= y + h


def test_gui_world_filter_hides_instances():
    """World filter drops other worlds' instances from the draw list."""
    sub = nt.ModelBuilder()
    bb = sub.add_body(xform=[0, 0, 1.0, 0, 0, 0, 1])
    sub.add_shape_sphere(bb, radius=0.3)
    sub.add_joint_free(bb)
    b = nt.ModelBuilder()
    b.replicate(sub, 4)
    m = b.finalize()

    v = ViewerGL(offscreen=True)
    v.set_model(m)
    s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
    v.log_state(s)
    g = v._groups[0]
    assert len(v.instance_matrices(g)) == 4
    v.world_filter = 2
    assert len(v.instance_matrices(g)) == 1
    v.world_filter = None
    assert len(v.instance_matrices(g)) == 4


def test_gui_font_atlas_builds():
    """PIL font atlas rasterizes every printable ASCII glyph column."""
    from newton_tpu.viewer.viewer_gui import _build_font_atlas

    atlas, gw, gh = _build_font_atlas()
    assert atlas.ndim == 2 and atlas.dtype == np.uint8
    assert atlas.shape[1] == gw * 95      # ASCII 32..126
    assert atlas.max() > 128              # glyphs actually drawn
