"""Sensor tests (reference: tests for sensors/sensor_imu.py etc.)."""

import jax.numpy as jnp
import numpy as np
import pytest

import newton_tpu as nt
from newton_tpu.sensors import (SensorContact, SensorFrameTransform,
                                SensorIMU)
from newton_tpu.sensors.sensor_tiled_camera import SensorTiledCamera
from newton_tpu.sim.articulation import eval_fk


def test_imu_gravity_at_rest():
    b = nt.ModelBuilder()
    body = b.add_body(xform=[0, 0, 1, 0, 0, 0, 1], mass=1.0,
                      I_m=np.eye(3) * 0.1)
    b.add_shape_sphere(body, radius=0.1)
    site = b.add_site(body, key="imu_site")
    m = b.finalize()
    imu = SensorIMU(m, ["imu_site"])
    s = m.state()
    acc, gyro = imu.update(s, prev_state=s, dt=1e-3)
    # at rest, accelerometer reads -g = +9.81 up
    np.testing.assert_allclose(np.asarray(acc)[0], [0, 0, 9.81], atol=1e-4)
    np.testing.assert_allclose(np.asarray(gyro)[0], [0, 0, 0], atol=1e-6)


def test_frame_transform_relative_pose():
    b = nt.ModelBuilder()
    b1 = b.add_body(xform=[1, 0, 0, 0, 0, 0, 1], mass=1.0)
    s1 = b.add_site(b1, key="ref")
    b2 = b.add_body(xform=[1, 2, 0, 0, 0, 0, 1], mass=1.0)
    s2 = b.add_site(b2, key="tgt")
    m = b.finalize()
    sensor = SensorFrameTransform(m, ["ref"], ["tgt"])
    out = sensor.update(m.state())
    np.testing.assert_allclose(np.asarray(out)[0, :3], [0, 2, 0], atol=1e-6)


def test_contact_sensor_reduction():
    from newton_tpu.sim.contacts import Contacts
    b = nt.ModelBuilder()
    body = b.add_body(xform=[0, 0, 0.4, 0, 0, 0, 1])
    b.add_shape_sphere(body, radius=0.5, key="ball_shape")
    b.add_joint_free(body)
    b.add_ground_plane(key="ground")
    m = b.finalize()
    sensor = SensorContact(m, sensing_shapes=["ball_shape"])
    # hand-build a contacts buffer with a known force
    c = Contacts.zeros(2, 0)
    c = c.replace(
        rigid_contact_mask=jnp.array([True, False]),
        rigid_contact_shape0=jnp.array([1, -1], dtype=jnp.int32),  # ground
        rigid_contact_shape1=jnp.array([0, -1], dtype=jnp.int32),  # ball
        rigid_contact_force=jnp.array([[0.0, 0.0, 5.0], [0, 0, 0]]),
        rigid_contact_position=jnp.array([[0.0, 0.0, -0.1], [0, 0, 0]]),
    )
    f, t = sensor.update(c)
    np.testing.assert_allclose(np.asarray(f)[0], [0, 0, 5.0], atol=1e-6)


def test_camera_golden_image():
    """Golden-image regression for the tiled camera (reference:
    tests/golden_data camera tests): a canonical sphere+box+ground scene
    must render the stored depth/shape-index image."""
    import os
    golden = np.load(os.path.join(os.path.dirname(__file__), "golden_data",
                                  "camera_sphere_box.npz"))
    b = nt.ModelBuilder()
    body = b.add_body(xform=[0, 0, 0.5, 0, 0, 0, 1])
    b.add_shape_sphere(body, radius=0.5)
    b.add_joint_free(body)
    box = b.add_body(xform=[1.2, 0, 0.25, 0, 0, 0, 1])
    b.add_shape_box(box, hx=0.25, hy=0.25, hz=0.25)
    b.add_joint_free(box)
    b.add_ground_plane()
    m = b.finalize()
    s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
    cam = SensorTiledCamera(m, width=48, height=32)
    out = cam.render(s, golden["cam_xform"][None])
    depth = np.asarray(out["depth"][0])
    sidx = np.asarray(out["shape_index"][0])
    # shape ids may flip on silhouette pixels; the interiors must agree
    match = (sidx == golden["shape_index"]).mean()
    assert match > 0.98, f"shape-index image match {match:.3f}"
    both_hit = (sidx >= 0) & (golden["shape_index"] >= 0)
    err = np.abs(depth - golden["depth"])[both_hit]
    assert np.median(err) < 5e-3, f"depth drift: median {np.median(err)}"


def test_camera_extended_channels_and_shadows():
    """hdr/albedo channels + shadow rays (reference warp_raytrace channel
    set): a box hovering over the ground must darken the ground under it
    when shadows are on."""
    import newton_tpu as nt
    from newton_tpu.sensors.sensor_tiled_camera import SensorTiledCamera
    b = nt.ModelBuilder()
    body = b.add_body(xform=[0, 0, 0.6, 0, 0, 0, 1])
    b.add_shape_box(body, hx=0.3, hy=0.3, hz=0.05)
    b.add_joint_free(body)
    b.add_ground_plane()
    m = b.finalize()
    s = m.state()
    cam_x = np.asarray([0.0, -2.5, 1.5, 0.46, 0.0, 0.0, 0.888], np.float32)
    plain = SensorTiledCamera(m, width=48, height=36,
                              light_dir=(0.0, 0.0, -1.0))
    shad = SensorTiledCamera(m, width=48, height=36,
                             light_dir=(0.0, 0.0, -1.0), shadows=True)
    o1 = plain.render(s, cam_x[None])
    o2 = shad.render(s, cam_x[None])
    for key in ("depth", "normal", "shape_index", "color", "albedo", "hdr"):
        assert key in o1 and key in o2
    # albedo is unlit (no lambert falloff): brighter or equal to color
    assert float(jnp.mean(o1["albedo"])) >= float(jnp.mean(o1["color"])) - 1e-6
    # shadowing removes light somewhere in the frame
    assert float(jnp.mean(o2["hdr"])) < float(jnp.mean(o1["hdr"])) - 1e-4


def test_viewer_rtx_writes_png(tmp_path):
    """ViewerRTX renders a shadowed frame and writes a decodable PNG."""
    import struct
    import zlib

    import newton_tpu as nt
    from newton_tpu.viewer import ViewerRTX
    b = nt.ModelBuilder()
    body = b.add_body(xform=[0, 0, 0.5, 0, 0, 0, 1])
    b.add_shape_sphere(body, radius=0.3)
    b.add_joint_free(body)
    b.add_ground_plane()
    m = b.finalize()
    v = ViewerRTX(out_dir=str(tmp_path), width=64, height=48)
    v.set_model(m)
    s = m.state()
    v.begin_frame(0.0)
    v.log_state(s)
    v.end_frame()
    files = sorted(p for p in tmp_path.iterdir() if p.suffix == ".png")
    assert files, "no PNG written"
    data = files[0].read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    assert (w, h) == (64, 48)
    assert v.last_image is not None and np.isfinite(v.last_image).all()
    # the sphere must be visible: some pixels differ from the sky (black)
    assert float(np.asarray(v.last_image).max()) > 0.05


def test_camera_splat_channel():
    """Gaussian splat clouds composite into the color channel with a
    splat_alpha map (reference: sensors/warp_raytrace/gaussians.py)."""
    import jax.numpy as jnp
    import newton_tpu as nt
    from newton_tpu.sensors.sensor_tiled_camera import SensorTiledCamera

    b = nt.ModelBuilder()
    body = b.add_body(xform=[0, 0, 0.5, 0, 0, 0, 1])
    b.add_shape_sphere(body, radius=0.2)
    b.add_joint_free(body)
    b.add_shape_gaussian(-1, means=[[0.6, 0, 0.5], [0.8, 0.1, 0.6]],
                         scales=[[0.1, 0.1, 0.1], [0.08, 0.15, 0.05]],
                         quats=[[0, 0, 0, 1], [0, 0, 0, 1]],
                         colors=[[1, 0, 0], [0, 1, 0]],
                         opacities=[0.8, 0.7])
    b.add_ground_plane()
    m = b.finalize()
    cam = SensorTiledCamera(m, width=48, height=32)
    q = [np.sin(np.pi / 4), 0, 0, np.cos(np.pi / 4)]  # look along +y
    out = cam.render(m.state(),
                     jnp.asarray([[0.3, -2.2, 0.5] + q], dtype=jnp.float32))
    sa = np.asarray(out["splat_alpha"])[0]
    col = np.asarray(out["color"])[0]
    assert np.isfinite(col).all()
    assert sa.max() > 0.3                 # splats visible
    assert sa.min() == 0.0                # background untouched
    # red splat tints pixels red where alpha peaks
    py, px = np.unravel_index(sa.argmax(), sa.shape)
    assert col[py, px, 0] > col[py, px, 2]
    # occlusion: splats behind the sphere do not bleed through it
    ctr = cam.render(m.state(), jnp.asarray(
        [[0.0, -2.2, 0.5] + q], dtype=jnp.float32))
    si = np.asarray(ctr["shape_index"])[0]
    sa2 = np.asarray(ctr["splat_alpha"])[0]
    assert (sa2[si == 0] == 0).all() or sa2[si == 0].max() < 0.05


def test_camera_golden_mesh_scene():
    """Golden-image regression on a MESH scene: exact BVH triangle hits,
    shadows on (reference: tests/golden_data/test_sensor_tiled_camera/
    golden images; regenerate with tools/gen_golden_camera_mesh.py)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from gen_golden_camera_mesh import CAM_XFORM, build_scene
    golden = np.load(os.path.join(os.path.dirname(__file__), "golden_data",
                                  "camera_mesh_scene.npz"))
    m = build_scene()
    s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
    cam = SensorTiledCamera(m, width=48, height=32, shadows=True,
                            light_dir=(0.3, 0.2, -0.9))
    out = cam.render(s, CAM_XFORM[None])
    sidx = np.asarray(out["shape_index"][0])
    depth = np.asarray(out["depth"][0])
    color = np.asarray(out["color"][0])
    assert (sidx >= 0).mean() > 0.3, "scene mostly missed"
    match = (sidx == golden["shape_index"]).mean()
    assert match > 0.98, f"shape-index image match {match:.3f}"
    both = (sidx >= 0) & (golden["shape_index"] >= 0)
    err = np.abs(depth - golden["depth"])[both]
    assert np.median(err) < 5e-3, f"depth drift: median {np.median(err)}"
    cerr = np.abs(color - golden["color"]).mean()
    assert cerr < 0.02, f"color drift {cerr:.4f}"
