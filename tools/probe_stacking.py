"""Probe current stacking robustness: 10-box tower, 12-row brick wall,
50-hull pile — drift + jitter under SolverMuJoCo and XPBD.

Establishes the baseline for the persistent-manifold work (VERDICT r5 #1):
run BEFORE and AFTER to see what the manifold cache buys.
"""
import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.geometry.types import Mesh
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD
from newton_tpu.solvers.generalized.solver import SolverMuJoCo


def run(model, solver_name, seconds=10.0, dt=1 / 240., substeps=4,
        pipeline=None, iterations=10):
    pipe = pipeline or CollisionPipeline(model)
    if solver_name == "mujoco":
        solver = SolverMuJoCo(model, iterations=iterations,
                              integrator="euler")
    else:
        solver = SolverXPBD(model, iterations=iterations)
    state = model.state()

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, None, pipe.collide(s), dt), None
        return jax.lax.scan(sub, s, None, length=substeps)[0]

    q0 = np.asarray(state.body_q)
    n_frames = int(seconds / (dt * substeps))
    t0 = time.time()
    traj = []
    for i in range(n_frames):
        state = frame(state)
        if i % 30 == 0 or i >= n_frames - 60:
            traj.append(np.asarray(state.body_q[:, :3]))
    qf = np.asarray(state.body_q)
    drift = np.linalg.norm(qf[:, :2] - q0[:, :2], axis=-1)
    zdrift = np.abs(qf[:, 2] - q0[:, 2])
    # jitter: max frame-to-frame displacement over the last second
    tail = np.stack(traj[-60:])
    jitter = np.abs(np.diff(tail, axis=0)).max()
    print(f"  {solver_name}: max_xy_drift={drift.max():.4f} m  "
          f"max_z_drift={zdrift.max():.4f} m  tail_jitter={jitter:.5f} m  "
          f"finite={np.isfinite(qf).all()}  wall={time.time()-t0:.0f}s")
    return drift.max(), jitter


def tower(n=10, hx=0.1):
    b = nt.ModelBuilder(gravity=-9.81)
    cfg = b.default_shape_cfg.copy()
    cfg.mu = 0.8
    for i in range(n):
        body = b.add_body(xform=[0, 0, hx + i * 2 * hx * 1.001, 0, 0, 0, 1])
        b.add_shape_box(body, hx=hx, hy=hx, hz=hx, cfg=cfg)
        b.add_joint_free(body)
    b.add_ground_plane()
    return b.finalize()


def wall(rows=12, cols=3):
    BX, BY, BZ = 0.12, 0.06, 0.045
    b = nt.ModelBuilder(gravity=-9.81)
    cfg = b.default_shape_cfg.copy()
    cfg.mu = 0.8
    for row in range(rows):
        offset = (row % 2 - 0.5) * (BX / 2)
        for col in range(cols):
            pos = [offset + col * 2 * BX * 1.01 - cols * BX, 0.0,
                   BZ + row * 2 * BZ * 1.002]
            bb = b.add_body(xform=pos + [0, 0, 0, 1])
            b.add_shape_box(bb, hx=BX, hy=BY, hz=BZ, cfg=cfg)
            b.add_joint_free(bb)
    b.add_ground_plane()
    return b.finalize()


def hull_pile(n=50):
    rng = np.random.RandomState(0)
    b = nt.ModelBuilder(gravity=-9.81)
    cfg = b.default_shape_cfg.copy()
    cfg.mu = 0.6
    from scipy.spatial import ConvexHull
    for i in range(n):
        pts = (rng.randn(12, 3) * 0.06).astype(np.float32)
        hull = ConvexHull(pts)
        mesh = Mesh(vertices=pts,
                    indices=hull.simplices.astype(np.int32).reshape(-1))
        pos = [rng.uniform(-0.25, 0.25), rng.uniform(-0.25, 0.25),
               0.15 + 0.14 * i]
        body = b.add_body(xform=pos + [0, 0, 0, 1])
        b.add_shape_convex_hull(body, mesh=mesh, cfg=cfg)
        b.add_joint_free(body)
    b.add_ground_plane()
    return b.finalize()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "tower"):
        print("10-box tower:")
        m = tower()
        run(m, "mujoco")
        run(m, "xpbd")
    if which in ("all", "wall"):
        print("12-row brick wall (3x example height):")
        m = wall()
        run(m, "mujoco")
    if which in ("all", "pile"):
        print("50-hull pile:")
        m = hull_pile()
        run(m, "mujoco")
        run(m, "xpbd")
