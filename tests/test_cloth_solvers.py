"""Cloth/soft solver tests: VBD, Style3D, SemiImplicit, MPM
(reference: test_solver_vbd.py, test_softbody_simulation.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import newton_tpu as nt
from newton_tpu.solvers import SolverSemiImplicit, SolverStyle3D, SolverVBD
from newton_tpu.solvers.solver_mpm import SolverImplicitMPM


def cloth_model():
    b = nt.ModelBuilder()
    b.add_cloth_grid(pos=(0, 0, 1.0), dim_x=6, dim_y=6,
                     cell_x=0.1, cell_y=0.1, mass=1.0, fix_top=True,
                     tri_ke=500.0, edge_ke=2.0)
    return b.finalize()


def run_cloth(solver_cls, frames=30, dt=1 / 240., substeps=8, **kw):
    m = cloth_model()
    solver = solver_cls(m, **kw)
    s = m.state()
    ctrl = m.control()

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, ctrl, None, dt), None
        return jax.lax.scan(sub, s, None, length=substeps)[0]

    for _ in range(frames):
        s = frame(s)
    return m, s


@pytest.mark.parametrize("solver_cls,kw", [
    (SolverVBD, dict(iterations=3)),
    (SolverStyle3D, dict(iterations=6)),
])
def test_cloth_hangs(solver_cls, kw):
    m, s = run_cloth(solver_cls, **kw)
    pq = np.asarray(s.particle_q)
    assert np.isfinite(pq).all()
    fixed = np.asarray(m.particle_inv_mass) == 0
    np.testing.assert_allclose(pq[fixed, 2], 1.0, atol=1e-4)
    # free cloth drapes below its pinned row but doesn't fall apart
    assert pq[~fixed, 2].mean() < 0.98
    assert pq[:, 2].min() > 0.0
    # stretch bounded: no edge longer than 2x rest
    ti = np.asarray(m.tri_indices)
    e = np.linalg.norm(pq[ti[:, 0]] - pq[ti[:, 1]], axis=-1)
    assert e.max() < 0.25


def _two_layer_model(radius=0.03, gap=0.004):
    """Two overlapping cloth layers (gap << contact distance) for
    pass-through / pinch tests."""
    b = nt.ModelBuilder()
    b.gravity = 0.0
    for z in (1.0, 1.0 + gap):
        b.add_cloth_grid(pos=(0, 0, z), dim_x=4, dim_y=4,
                         cell_x=0.1, cell_y=0.1, mass=1.0,
                         radius=radius, tri_ke=500.0, edge_ke=2.0)
    return b.finalize()


def _layer_separation(m, s):
    pq = np.asarray(s.particle_q)
    n = pq.shape[0] // 2
    a, bl = pq[:n], pq[n:]
    d = np.linalg.norm(a[:, None, :] - bl[None, :, :], axis=-1)
    return d.min()


def test_vbd_self_collision_separates_layers():
    """VBD with handle_self_contact pushes overlapping layers apart
    (reference: vbd/tri_mesh_collision.py:235); without it they stay
    interpenetrating."""
    m = _two_layer_model()
    r_self = 0.06

    def run(**kw):
        solver = SolverVBD(m, iterations=4, **kw)
        s, ctrl = m.state(), m.control()

        @jax.jit
        def frame(s):
            def sub(s, _):
                return solver.step(s, None, ctrl, None, 1 / 240.), None
            return jax.lax.scan(sub, s, None, length=4)[0]
        for _ in range(10):
            s = frame(s)
        return s

    s_on = run(handle_self_contact=True, self_contact_radius=r_self,
               self_contact_ke=1e4)
    assert np.isfinite(np.asarray(s_on.particle_q)).all()
    sep_on = _layer_separation(m, s_on)
    s_off = run(handle_self_contact=False)
    sep_off = _layer_separation(m, s_off)
    assert sep_on > 0.45 * r_self, f"layers still overlapping: {sep_on}"
    assert sep_off < 0.25 * r_self, \
        f"control run should stay overlapped: {sep_off}"


def test_xpbd_cloth_self_collision():
    """XPBD particle-particle contacts (sorted hashgrid) keep cloth layers
    from passing through (reference: solve_particle_particle_contacts)."""
    from newton_tpu.solvers import SolverXPBD
    m = _two_layer_model(radius=0.03)
    solver = SolverXPBD(m, iterations=4)
    s, ctrl = m.state(), m.control()

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, ctrl, None, 1 / 240.), None
        return jax.lax.scan(sub, s, None, length=4)[0]
    for _ in range(10):
        s = frame(s)
    assert np.isfinite(np.asarray(s.particle_q)).all()
    sep = _layer_separation(m, s)
    assert sep > 0.025, f"XPBD layers interpenetrate: {sep}"


def test_vbd_bending_resists_drape():
    """Dihedral bending energy stiffens the drape: a high-edge_ke cloth
    hangs higher than a floppy one (reference VBD bending energy,
    particle_vbd_kernels)."""
    def droop(edge_ke):
        b = nt.ModelBuilder()
        b.add_cloth_grid(pos=(0, 0, 1.0), dim_x=6, dim_y=6,
                         cell_x=0.1, cell_y=0.1, mass=1.0, fix_top=True,
                         tri_ke=500.0, edge_ke=edge_ke)
        m = b.finalize()
        solver = SolverVBD(m, iterations=3)
        s, ctrl = m.state(), m.control()

        @jax.jit
        def frame(s):
            def sub(s, _):
                return solver.step(s, None, ctrl, None, 1 / 240.), None
            return jax.lax.scan(sub, s, None, length=8)[0]
        for _ in range(25):
            s = frame(s)
        pq = np.asarray(s.particle_q)
        assert np.isfinite(pq).all()
        free = np.asarray(m.particle_inv_mass) > 0
        return pq[free, 2].mean()

    soft = droop(0.001)
    stiff = droop(50.0)
    assert stiff > soft + 0.01, \
        f"bending has no stiffening effect: stiff {stiff} vs soft {soft}"


@pytest.mark.slow
def test_style3d_scales_to_large_cloth():
    """100x100 garment through the sparse matrix-free PCG path (reference:
    style3d/linear_solver.py:22): O(N) memory — the removed dense Cholesky
    would allocate ~416 MB here — and <10 CG iters/substep convergence."""
    b = nt.ModelBuilder()
    b.add_cloth_grid(pos=(0, 0, 2.0), dim_x=100, dim_y=100,
                     cell_x=0.02, cell_y=0.02, mass=2.0, fix_top=True,
                     tri_ke=500.0, edge_ke=1.0)
    m = b.finalize()
    solver = SolverStyle3D(m, iterations=4)
    s, ctrl = m.state(), m.control()

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, ctrl, None, 1 / 240.), None
        return jax.lax.scan(sub, s, None, length=2)[0]

    for _ in range(3):
        s = frame(s)
    pq = np.asarray(s.particle_q)
    assert np.isfinite(pq).all()
    fixed = np.asarray(m.particle_inv_mass) == 0
    np.testing.assert_allclose(pq[fixed, 2], 2.0, atol=1e-3)
    # PCG solves the PD system: residual drops below 1e-3 relative within
    # the 8-iteration budget on a representative rhs
    import jax.numpy as jnp
    dt = 1 / 240.
    diag = solver._diag(dt)
    w = jnp.asarray(solver.c_w, dtype=jnp.float32)
    rhs = diag[:, None] * s.particle_q      # well-scaled synthetic rhs
    x = solver._pcg(jnp.zeros_like(rhs), rhs, diag, w, iters=8)
    r = np.asarray(rhs - solver._apply_A(x, diag, w))
    rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(rhs))
    assert rel < 1e-3, f"PCG residual {rel}"


def test_semi_implicit_stable():
    m, s = run_cloth(SolverSemiImplicit, frames=30, dt=1 / 2000., substeps=20)
    assert np.isfinite(np.asarray(s.particle_q)).all()


def test_mpm_sand_settles():
    b = nt.ModelBuilder()
    b.add_particle_grid(pos=(-0.1, -0.1, 0.5), dim_x=4, dim_y=4, dim_z=4,
                        cell_x=0.05, cell_y=0.05, cell_z=0.05,
                        mass=0.05, radius=0.02)
    m = b.finalize()
    solver = SolverImplicitMPM(m, grid_lower=(-1, -1, 0), grid_upper=(1, 1, 2),
                               resolution=32, friction_angle=0.6)
    s = solver.init_state(m.state())

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, None, None, 5e-4), None
        return jax.lax.scan(sub, s, None, length=20)[0]

    for _ in range(40):
        s = frame(s)
    pq = np.asarray(s.particle_q)
    assert np.isfinite(pq).all()
    assert pq[:, 2].mean() < 0.5      # fell
    assert pq[:, 2].min() > -0.05     # floor held
    # stays inside the grid
    assert np.abs(pq[:, :2]).max() < 1.0


def test_xpbd_granular_no_interpenetration():
    from newton_tpu.sim.collide import CollisionPipeline
    from newton_tpu.solvers import SolverXPBD
    b = nt.ModelBuilder()
    b.add_particle_grid(pos=(0, 0, 0.3), dim_x=3, dim_y=3, dim_z=3,
                        cell_x=0.11, cell_y=0.11, cell_z=0.11,
                        mass=0.1, radius=0.05)
    b.add_ground_plane()
    m = b.finalize()
    pipe = CollisionPipeline(m)
    solver = SolverXPBD(m, iterations=3)
    s = m.state()
    ctrl = m.control()

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, ctrl, pipe.collide(s), 1 / 240.), None
        return jax.lax.scan(sub, s, None, length=4)[0]

    for _ in range(90):
        s = frame(s)
    pq = np.asarray(s.particle_q)
    assert np.isfinite(pq).all()
    assert pq[:, 2].min() > 0.03      # resting on the ground, not through it
    d = np.linalg.norm(pq[:, None] - pq[None, :], axis=-1)
    d[np.arange(len(pq)), np.arange(len(pq))] = 1.0
    assert d.min() > 0.085            # no deep interpenetration (2r = 0.1)


def test_style3d_self_collision_separates_layers():
    """Style3D with handle_self_contact pushes overlapping layers apart
    (reference: style3d/collision/); the penalty rides the PD rhs so the
    prefactored global system stays constant."""
    from newton_tpu.solvers import SolverStyle3D

    def run(on):
        m = _two_layer_model(radius=0.03)
        solver = SolverStyle3D(m, iterations=4, handle_self_contact=on)
        s, ctrl = m.state(), m.control()

        @jax.jit
        def frame(s):
            def sub(s, _):
                return solver.step(s, None, ctrl, None, 1 / 240.), None
            return jax.lax.scan(sub, s, None, length=4)[0]

        for _ in range(10):
            s = frame(s)
        assert np.isfinite(np.asarray(s.particle_q)).all()
        return _layer_separation(m, s)

    sep_on = run(True)
    sep_off = run(False)
    assert sep_on > 0.04, f"Style3D layers interpenetrate: {sep_on}"
    assert sep_off < 0.02, f"control run should stay overlapped: {sep_off}"


def test_particle_shape_rest_mass_independent():
    """A light particle rests on the ground at the same height as a heavy
    one: the soft-contact positional correction must not scale with
    inv_mass (regression: light particles were launched off shapes)."""
    import newton_tpu as nt
    from newton_tpu.sim.collide import CollisionPipeline
    from newton_tpu.solvers.solver_xpbd import SolverXPBD

    b = nt.ModelBuilder(gravity=-9.81)
    b.add_particle([0, 0, 0.3], mass=0.02, radius=0.05)
    b.add_particle([1, 0, 0.3], mass=2.0, radius=0.05)
    b.add_ground_plane()
    m = b.finalize()
    pipe = CollisionPipeline(m)
    solver = SolverXPBD(m, iterations=4)
    s = m.state()

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, None, pipe.collide(s), 1 / 240.), None
        return jax.lax.scan(sub, s, None, length=4)[0]

    for _ in range(90):
        s = frame(s)
    z = np.asarray(s.particle_q)[:, 2]
    assert np.allclose(z, 0.05, atol=5e-3), z


def test_particle_shape_friction_follows_surface():
    """Particle-shape friction is evaluated against the shape SURFACE
    velocity: a kinematic belt drags a resting particle along at belt
    speed (reference: xpbd solve_particle_shape_contacts friction)."""
    import newton_tpu as nt
    from newton_tpu.sim.collide import CollisionPipeline
    from newton_tpu.solvers.solver_xpbd import SolverXPBD

    b = nt.ModelBuilder(gravity=-9.81)
    cfg = b.default_shape_cfg.copy()
    cfg.mu = 0.8
    belt = b.add_body(xform=[0, 0, 0.05, 0, 0, 0, 1],
                      qd=np.array([0.5, 0, 0, 0, 0, 0]), kinematic=True)
    b.add_shape_box(belt, hx=2.0, hy=0.5, hz=0.05, cfg=cfg)
    b.add_particle([0, 0, 0.18], mass=0.05, radius=0.05)
    m = b.finalize()
    pipe = CollisionPipeline(m)
    solver = SolverXPBD(m, iterations=4)
    s = m.state()

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, None, pipe.collide(s), 1 / 240.), None
        return jax.lax.scan(sub, s, None, length=4)[0]

    for _ in range(120):
        s = frame(s)
    v = np.asarray(s.particle_qd)[0]
    p = np.asarray(s.particle_q)[0]
    assert abs(v[0] - 0.5) < 0.05, f"vx={v[0]} (belt 0.5)"
    assert p[0] > 0.7, f"x={p[0]}"
