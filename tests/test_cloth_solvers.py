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
