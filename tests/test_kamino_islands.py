"""Island-blocked Kamino factorization (reference: Kamino's per-world
sparse factorization suite, kamino/_src/linalg/factorize/ + blas.py:1575).

The TPU redesign: contact rows are permuted by a host-planned island
partition (connected components of the body/articulation coupling graph),
turning the per-env dense (r, r) Delassus Cholesky into batched
(n_isl, rb, rb) blocks — O(sum rb^3) work instead of O(r^3), and VMEM-sized
factor tiles. These tests gate (a) that separated stacks are found as
separate islands and (b) that the blocked solve is numerically identical to
the dense factorization it replaces.
"""

import functools

import jax
import numpy as np

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverKamino

H = 0.1


def build_stacks(n_stacks=3, height=2, spacing=2.0):
    """Stacks in distinct collision groups (positive groups only pair
    within themselves; the ground's negative group pairs with all) — the
    candidate-slot graph then decomposes, which is what the static island
    planner keys on. With NXN candidate pairs everything couples and the
    planner honestly reports one island."""
    b = nt.ModelBuilder(gravity=-9.81)
    for s in range(n_stacks):
        cfg = b.default_shape_cfg.copy()
        cfg.mu = 0.7
        cfg.collision_group = s + 1
        x = s * spacing
        for i in range(height):
            z = H + 2 * H * 1.01 * i
            bb = b.add_body(xform=[x, 0.0, z, 0, 0, 0, 1],
                            key=f"s{s}b{i}")
            b.add_shape_box(bb, hx=H, hy=H, hz=H, cfg=cfg)
            b.add_joint_free(bb)
    gcfg = b.default_shape_cfg.copy()
    gcfg.mu = 0.7
    gcfg.collision_group = -1
    b.add_ground_plane(cfg=gcfg)
    return b.finalize()


def run(m, solver, n_steps, dt=1 / 240):
    pipe = CollisionPipeline(m)
    s = solver.init_state(m.state())
    c0 = pipe.contacts()

    @functools.partial(jax.jit, static_argnums=2)
    def go(s, c, n):
        def sub(carry, _):
            s, c = carry
            c = pipe.collide(s)
            return (solver.step(s, None, None, c, dt), c), None
        return jax.lax.scan(sub, (s, c), None, length=n)[0]

    sf, _ = go(s, c0, n_steps)
    return np.asarray(sf.body_q), np.asarray(sf.body_qd)


def test_island_partition_finds_separated_stacks():
    """3 two-box stacks with no cross-stack contact slots -> >= 3 islands,
    block size well under the full row count."""
    m = build_stacks(n_stacks=3, height=2)
    solver = SolverKamino(m, iterations=16)
    q, qd = run(m, solver, 30)
    assert solver._last_islands is not None, "island path did not engage"
    n_isl, rb, r = solver._last_islands
    assert n_isl >= 3
    assert rb < r
    assert np.isfinite(q).all() and np.isfinite(qd).all()


def test_island_solve_matches_dense():
    """The blocked factorization is the same linear algebra as the dense
    one: identical trajectories (same rows, same rho, same ADMM sweep)."""
    m = build_stacks(n_stacks=3, height=2)
    sol_isl = SolverKamino(m, iterations=16, use_islands=True,
                           contact_cap=0)
    sol_dense = SolverKamino(m, iterations=16, use_islands=False,
                             contact_cap=0)
    q_i, qd_i = run(m, sol_isl, 60)
    q_d, qd_d = run(m, sol_dense, 60)
    assert sol_isl._last_islands is not None
    assert sol_dense._last_islands is None
    np.testing.assert_allclose(q_i, q_d, atol=5e-5)
    np.testing.assert_allclose(qd_i, qd_d, atol=5e-4)


def test_island_tall_stack_stable():
    """A single 6-box tower (one island, engages only when a second stack
    exists): tower + one separate box -> 2 islands; tower height holds."""
    b = nt.ModelBuilder(gravity=-9.81)
    cfg = b.default_shape_cfg.copy()
    cfg.mu = 0.8
    cfg.collision_group = 1
    for i in range(6):
        z = H + 2 * H * 1.005 * i
        bb = b.add_body(xform=[0.0, 0.0, z, 0, 0, 0, 1], key=f"b{i}")
        b.add_shape_box(bb, hx=H, hy=H, hz=H, cfg=cfg)
        b.add_joint_free(bb)
    cfg2 = cfg.copy()
    cfg2.collision_group = 2
    lone = b.add_body(xform=[2.0, 0.0, H, 0, 0, 0, 1], key="lone")
    b.add_shape_box(lone, hx=H, hy=H, hz=H, cfg=cfg2)
    b.add_joint_free(lone)
    gcfg = cfg.copy()
    gcfg.collision_group = -1
    b.add_ground_plane(cfg=gcfg)
    m = b.finalize()
    solver = SolverKamino(m, iterations=24)
    q, qd = run(m, solver, 240)
    assert solver._last_islands is not None
    n_isl, rb, r = solver._last_islands
    assert n_isl >= 2
    # top box stays near its stacked height (no collapse, no explosion)
    assert np.isfinite(q).all()
    assert abs(q[5, 2] - (H + 2 * H * 1.005 * 5)) < 0.05
    assert float(np.abs(qd).max()) < 0.5
