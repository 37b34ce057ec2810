"""Generate the golden image for the mesh-scene tiled-camera test
(reference: tests/golden_data/test_sensor_tiled_camera/ golden images).

Scene: an icosahedron MESH (exact BVH triangle hits), a box, and the
ground plane, rendered with shadows on. Run from the repo root:

    JAX_PLATFORMS=cpu python tools/gen_golden_camera_mesh.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import newton_tpu as nt                                     # noqa: E402
from newton_tpu.sensors.sensor_tiled_camera import SensorTiledCamera  # noqa: E402
from newton_tpu.sim.articulation import eval_fk             # noqa: E402


def icosahedron(r=0.5):
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([
        [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
        [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
        [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
    ], dtype=np.float64)
    v *= r / np.linalg.norm(v[0])
    f = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], dtype=np.int32)
    return v, f


def build_scene():
    b = nt.ModelBuilder()
    verts, faces = icosahedron(0.5)
    mesh = nt.Mesh(verts, faces.reshape(-1), compute_inertia=False)
    mb = b.add_body(xform=[0.0, 0.0, 0.6, 0, 0, 0, 1])
    b.add_shape_mesh(mb, mesh=mesh)
    b.add_joint_free(mb)
    box = b.add_body(xform=[1.1, 0.2, 0.25, 0, 0, 0, 1])
    b.add_shape_box(box, hx=0.25, hy=0.25, hz=0.25)
    b.add_joint_free(box)
    b.add_ground_plane()
    return b.finalize()


CAM_XFORM = np.asarray([0.0, -3.0, 1.6, 0.42, 0.0, 0.0, 0.9075], np.float32)


def main():
    m = build_scene()
    s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
    cam = SensorTiledCamera(m, width=48, height=32, shadows=True,
                            light_dir=(0.3, 0.2, -0.9))
    out = cam.render(s, CAM_XFORM[None])
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden_data",
        "camera_mesh_scene.npz")
    np.savez(path, cam_xform=CAM_XFORM,
             depth=np.asarray(out["depth"][0]),
             shape_index=np.asarray(out["shape_index"][0]),
             color=np.asarray(out["color"][0]))
    hit = (np.asarray(out["shape_index"][0]) >= 0).mean()
    print(f"wrote {path}: hit fraction {hit:.3f}")


if __name__ == "__main__":
    main()
