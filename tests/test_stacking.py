"""Stacking-robustness gates (reference: stable stacking via persistent
incremental manifolds, geometry/multicontact.py:118 BodyProjector + :134
IncrementalPlaneTracker; here: static-slot anchored manifolds,
sim/collide.py _apply_persistence + two-sided cross-env contact rows,
solvers/generalized/solver.py _plan_group_contacts).

The perturbed tower is the discriminating case: every box carries a small
random yaw + lateral offset, so the box-box manifold must clip (not reject)
laterally-excess corners, contacts must target the true relative velocity
of the pair, and both bodies must receive their half of the impulse pair.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import newton_tpu as nt
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo, SolverXPBD

H = 0.1  # box half-extent


def build_tower(n, seed=0, jitter=True, masses=None):
    rng = np.random.default_rng(seed)
    b = nt.ModelBuilder(gravity=-9.81)
    cfg = b.default_shape_cfg.copy()
    cfg.mu = 0.8
    for i in range(n):
        z = H + 2 * H * 1.002 * i
        yaw = rng.uniform(-0.05, 0.05) if jitter else 0.0
        x, y = (rng.uniform(-5e-3, 5e-3, 2) if jitter else (0.0, 0.0))
        q = [0.0, 0.0, float(np.sin(yaw / 2)), float(np.cos(yaw / 2))]
        c = cfg
        if masses is not None:
            c = cfg.copy()
            c.density = masses[i]
        bb = b.add_body(xform=[float(x), float(y), z] + q, key=f"b{i}")
        b.add_shape_box(bb, hx=H, hy=H, hz=H, cfg=c)
        b.add_joint_free(bb)
    b.add_ground_plane()
    return b.finalize()


def run_tower(m, solver, pipe, n_settle, n_hold, dt, persistent):
    s = (solver.init_state(m.state())
         if hasattr(solver, "init_state") else m.state())
    c0 = pipe.contacts()

    @functools.partial(jax.jit, static_argnums=2)
    def run(s, c, n):
        def sub(carry, _):
            s, c = carry
            c = pipe.collide(s, prev=c) if persistent else pipe.collide(s)
            return (solver.step(s, None, None, c, dt), c), None
        return jax.lax.scan(sub, (s, c), None, length=n)[0]

    s1, c1 = run(s, c0, n_settle)
    q1 = np.asarray(s1.body_q)
    sf, _ = run(s1, c1, n_hold)
    q = np.asarray(sf.body_q)
    return q1, q, np.asarray(sf.body_qd)


@pytest.mark.slow
def test_tower_10box_mujoco_persistent():
    """10-box perturbed tower, 10 simulated seconds: settles in 1 s, then
    drifts < 1 cm over the following 9 s; stays upright; no jitter."""
    m = build_tower(10)
    pipe = CollisionPipeline(m, persistent_manifolds=True)
    # cap=0: the tower's ~100 simultaneous contacts exceed the default
    # per-env compaction cap; warm_start off: impulse carry-over excites
    # the column's pogo mode (see solver docstrings)
    solver = SolverMuJoCo(m, iterations=40, integrator="euler",
                          warm_start=False, baumgarte=0.2, contact_cap=0)
    q1, q, qd = run_tower(m, solver, pipe, 240, 2160, 1 / 240, True)
    assert np.isfinite(q).all()
    drift = np.abs(q[:, :3] - q1[:, :3]).max()
    assert drift < 0.01, f"post-settle drift {drift:.4f} m"
    upright = 1.0 - 2.0 * (q[:, 3] ** 2 + q[:, 4] ** 2)
    assert upright.min() > 0.95, f"tower tipped: {upright.min():.3f}"
    assert np.abs(qd).max() < 0.05, f"jitter: |qd|max {np.abs(qd).max():.3f}"


@pytest.mark.slow
def test_tower_8box_xpbd():
    """8-box perturbed tower under XPBD with persistent manifolds: stays
    standing and quiescent for 5 simulated seconds."""
    m = build_tower(8, seed=1)
    pipe = CollisionPipeline(m, persistent_manifolds=True)
    solver = SolverXPBD(m, iterations=20)
    q1, q, qd = run_tower(m, solver, pipe, 240, 960, 1 / 240, True)
    assert np.isfinite(q).all()
    upright = 1.0 - 2.0 * (q[:, 3] ** 2 + q[:, 4] ** 2)
    assert upright.min() > 0.95, f"tower tipped: {upright.min():.3f}"
    drift = np.abs(q[:, :2] - q1[:, :2]).max()
    # without persistent manifolds this tower COLLAPSES by step ~250
    assert drift < 0.05, f"lateral drift {drift:.4f} m"
    assert np.abs(qd).max() < 0.05, f"jitter {np.abs(qd).max():.3f}"


@pytest.mark.slow
def test_pile_50_bodies_settles():
    """50-body box pile (dynamic SAP broad phase): rains into a pile,
    stays finite, and is quiescent after 2 simulated seconds."""
    rng = np.random.default_rng(7)
    b = nt.ModelBuilder(gravity=-9.81)
    cfg = b.default_shape_cfg.copy()
    cfg.mu = 0.6
    for i in range(50):
        x, y = rng.uniform(-0.4, 0.4, 2)
        z = 0.12 + 0.15 * (i // 12)
        bb = b.add_body(xform=[float(x), float(y), float(z), 0, 0, 0, 1],
                        key=f"p{i}")
        b.add_shape_box(bb, hx=0.05, hy=0.05, hz=0.05, cfg=cfg)
        b.add_joint_free(bb)
    b.add_ground_plane()
    m = b.finalize()
    pipe = CollisionPipeline(m, mode="dynamic", broad_phase="sap",
                             dynamic_pair_budget=600)
    solver = SolverXPBD(m, iterations=8)
    s = m.state()

    @jax.jit
    def run(s):
        def sub(s, _):
            return solver.step(s, None, None, pipe.collide(s), 1 / 120), None
        return jax.lax.scan(sub, s, None, length=240)[0]

    sf = run(s)
    q = np.asarray(sf.body_q)
    assert np.isfinite(q).all()
    assert q[:, 2].min() > 0.0, "body fell through the ground"
    assert q[:, 2].max() < 1.5, "pile exploded upward"
    assert np.abs(q[:, :2]).max() < 2.0, "pile scattered"


@pytest.mark.slow
def test_mass_ratio_1000_stack():
    """1000:1 mass-ratio stack (heavy box on a light box): the light box
    must transmit the heavy box's weight to the ground without being
    crushed through it. The impratio-softened PGS sweep stalls here (the
    light box ends fully crushed at z~0); SolverKamino's PADMM with its
    exact per-env Cholesky sub-solve holds both boxes at their rest
    heights (reference: kamino/_src/solvers/padmm.py's raison d'etre)."""
    from newton_tpu.solvers import SolverKamino
    m = build_tower(2, jitter=False, masses=[100.0, 100000.0])
    pipe = CollisionPipeline(m, persistent_manifolds=True)
    solver = SolverKamino(m, iterations=32, contact_cap=0)
    q1, q, qd = run_tower(m, solver, pipe, 240, 480, 1 / 240, True)
    assert np.isfinite(q).all()
    # both boxes near their rest heights (allow compliant penetration)
    assert abs(q[0, 2] - H) < 0.01, f"light box crushed: z={q[0, 2]:.4f}"
    assert abs(q[1, 2] - 3 * H) < 0.01, f"heavy box sank: z={q[1, 2]:.4f}"
    assert np.abs(qd).max() < 0.01


def test_third_law_reaction():
    """A box resting on another box loads it: the lower box's ground
    contact must carry BOTH weights (cross-env reaction forces exist)."""
    m = build_tower(2, jitter=False)
    pipe = CollisionPipeline(m)
    solver = SolverMuJoCo(m, iterations=40, integrator="euler",
                          warm_start=False, contact_cap=0)
    s = solver.init_state(m.state())
    dt = 1 / 240

    @jax.jit
    def settle(s):
        def sub(s, _):
            return solver.step(s, None, None, pipe.collide(s), dt), None
        return jax.lax.scan(sub, s, None, length=200)[0]

    s = settle(s)
    c = pipe.collide(s)
    _, c2 = solver.step_with_contacts(s, None, None, c, dt)
    f = np.asarray(c2.rigid_contact_force)
    s0 = np.asarray(c2.rigid_contact_shape0)
    s1 = np.asarray(c2.rigid_contact_shape1)
    types = np.asarray(m.structure.shape_type)
    from newton_tpu.geometry.types import GeoType
    is_plane = types == int(GeoType.PLANE)
    mask = np.asarray(c2.rigid_contact_mask)
    # total normal force on the ground contact ~ weight of BOTH boxes
    gnd = mask & (is_plane[np.maximum(s0, 0)] | is_plane[np.maximum(s1, 0)])
    f_gnd = np.abs(f[gnd][:, 2].sum())
    m_tot = 2.0 / np.asarray(m.body_inv_mass)[0]  # two equal boxes
    assert abs(f_gnd - m_tot * 9.81) < 0.35 * m_tot * 9.81, (
        f"ground carries {f_gnd:.1f} N, expected ~{m_tot * 9.81:.1f} N")
    # the box-box contact itself carries the upper box's weight
    bb = mask & ~is_plane[np.maximum(s0, 0)] & ~is_plane[np.maximum(s1, 0)]
    f_bb = np.abs(f[bb][:, 2].sum())
    m_one = 1.0 / np.asarray(m.body_inv_mass)[0]
    assert abs(f_bb - m_one * 9.81) < 0.35 * m_one * 9.81, (
        f"box-box interface carries {f_bb:.1f} N, "
        f"expected ~{m_one * 9.81:.1f} N")


def test_persistent_manifold_anchors():
    """Manifold persistence: with an unchanged state, kept slots reuse the
    cached anchors bit-for-bit; a large tangential slide refreshes them."""
    m = build_tower(2, jitter=False)
    pipe = CollisionPipeline(m, persistent_manifolds=True)
    s = m.state()
    c0 = pipe.contacts()
    c1 = pipe.collide(s, prev=c0)
    assert "manifold:a0" in c1.custom
    c2 = pipe.collide(s, prev=c1)
    # kept slots reuse cached anchors; non-kept slots re-derive fresh ones
    # from the persisted positions (fp-identical up to one roundtrip)
    np.testing.assert_allclose(np.asarray(c1.rigid_contact_position),
                               np.asarray(c2.rigid_contact_position),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1.custom["manifold:a0"]),
                               np.asarray(c2.custom["manifold:a0"]),
                               atol=1e-6)
    # slide the upper box far sideways: slots must refresh, not keep
    bq = np.asarray(s.body_q).copy()
    bq[1, 0] += 0.15
    s3 = s.replace(body_q=jnp.asarray(bq))
    c3 = pipe.collide(s3, prev=c2)
    assert np.isfinite(np.asarray(c3.rigid_contact_depth)).all()
    active = np.asarray(c3.rigid_contact_mask)
    pos3 = np.asarray(c3.rigid_contact_position)[active]
    # refreshed points must lie inside the new overlap x-range
    assert pos3[:, 0].max() <= bq[1, 0] + H + 1e-6
