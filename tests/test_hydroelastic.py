"""Hydroelastic pressure-field contacts.

Reference: newton/_src/geometry/sdf_hydroelastic.py (HydroelasticSDF :240,
linear pressure law :147, force export :1521-1539) and
contact_reduction_hydroelastic.py:1459 (wrench-conserving reduction).

TPU redesign under test: per-sample Voronoi VECTOR areas (builder
_sample_area_weights), equal-pressure surface shift + finer-side pressure
integration (sim/collide.py _mesh_contacts), wrench-conserving reduction
(geometry/contact_reduction.py reduce_contact_set_hydro), and XPBD
compliant-contact consumption (solver_xpbd.py solve_rigid_contacts).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import newton_tpu as nt
from newton_tpu.geometry.types import Mesh
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverXPBD


def _box_mesh(h):
    v = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                  for z in (-h, h)], np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5],
                  [0, 5, 1], [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4],
                  [1, 5, 7], [1, 7, 3]], np.int32)
    return Mesh(vertices=v, indices=f.reshape(-1))


def _pad_scene(kh_pad=1.0e6, kh_box=1.0e6, H=0.1):
    b = nt.ModelBuilder(gravity=-9.81)
    cfg_pad = b.default_shape_cfg.copy()
    cfg_pad.kh = kh_pad
    cfg_pad.mu = 0.6
    cfg_box = b.default_shape_cfg.copy()
    cfg_box.kh = kh_box
    cfg_box.mu = 0.6
    b.add_shape_box(-1, xform=[0, 0, -0.1, 0, 0, 0, 1], hx=1.0, hy=1.0,
                    hz=0.1, cfg=cfg_pad)
    body = b.add_body(xform=[0, 0, H + 0.002, 0, 0, 0, 1])
    b.add_shape_mesh(body, mesh=_box_mesh(H), cfg=cfg_box)
    b.add_joint_free(body)
    return b.finalize(), H


def test_sample_vector_areas():
    """Closed-surface vector areas sum to ~0 and the cube's bottom-face
    projection equals the exact face area (the divergence-theorem property
    the pressure integral relies on)."""
    m, H = _pad_scene()
    va = np.asarray(m.shape_sample_areas)
    # both shapes are closed surfaces
    assert np.linalg.norm(va[0].sum(0)) < 1e-6 * np.abs(va[0]).sum()
    assert np.linalg.norm(va[1].sum(0)) < 1e-6 * np.abs(va[1]).sum()
    # -z projection of the mesh cube == bottom face area (2H)^2
    zproj = np.maximum(-va[1][:, 2], 0.0).sum()
    np.testing.assert_allclose(zproj, (2 * H) ** 2, rtol=1e-5)


def test_hydro_reduction_conserves_wrench():
    """reduce_contact_set_hydro preserves the total patch force and the
    center of pressure (to cluster resolution) when collapsing an
    oversampled candidate set (reference keeps aggregate force terms from
    ALL faces, contact_reduction_hydroelastic.py:1592-1596)."""
    from newton_tpu.geometry.contact_reduction import reduce_contact_set_hydro
    rng = np.random.RandomState(3)
    K, k = 48, 6
    pos = jnp.asarray(rng.uniform(-0.1, 0.1, (2, K, 3)), jnp.float32)
    nrm = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32),
                           (2, K, 3))
    depth = jnp.asarray(rng.uniform(0.0, 0.01, (2, K)), jnp.float32)
    fmag = jnp.asarray(rng.uniform(0.0, 5.0, (2, K)), jnp.float32)
    active = depth > 0.002
    p, n, d, f = reduce_contact_set_hydro(pos, nrm, depth, fmag, k,
                                          active=active)
    f_in = np.where(np.asarray(active), np.asarray(fmag), 0.0).sum(-1)
    np.testing.assert_allclose(np.asarray(f).sum(-1), f_in, rtol=1e-5)
    # center of pressure preserved
    w_in = np.where(np.asarray(active), np.asarray(fmag), 0.0)
    cop_in = (w_in[..., None] * np.asarray(pos)).sum(1) / f_in[:, None]
    fk = np.asarray(f)
    cop_out = (fk[..., None] * np.asarray(p)).sum(1) / fk.sum(-1)[:, None]
    np.testing.assert_allclose(cop_out, cop_in, atol=1e-3)


@pytest.mark.slow
def test_compliant_pad_equilibrium():
    """Rigid mesh cube resting on a compliant pad: the equilibrium
    penetration matches the analytic pressure balance
    m g = k_eff * A_bottom * delta and the reported contact wrench equals
    the weight (reference parity target: compliant contact patches,
    sdf_hydroelastic.py module docs)."""
    kh = 1.0e6
    m, H = _pad_scene(kh_pad=kh, kh_box=kh)
    pipe = CollisionPipeline(m, hydroelastic=True)
    solver = SolverXPBD(m, iterations=8)
    s, ctrl, dt = m.state(), m.control(), 1 / 240.

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, ctrl, pipe.collide(s), dt), None
        return jax.lax.scan(sub, s, None, length=4)[0]

    for _ in range(200):
        s = frame(s)
    z = float(s.body_q[0, 2])
    mass = float(1.0 / np.asarray(m.body_inv_mass)[0])
    keff = kh * kh / (kh + kh)
    delta_star = mass * 9.81 / (keff * (2 * H) ** 2)
    assert abs((H - z) - delta_star) < 0.15 * delta_star, (H - z, delta_star)
    # reported wrench == weight
    c = pipe.collide(s)
    _, c2 = solver.step_with_contacts(s, None, ctrl, c, dt)
    f = np.asarray(c2.rigid_contact_force)
    msk = np.asarray(c.rigid_contact_mask)
    Fz = f[msk][:, 2].sum()
    assert abs(Fz - mass * 9.81) < 0.05 * mass * 9.81, (Fz, mass * 9.81)

    # asymmetric moduli: soft pad (kh/4) vs stiff box -> k_eff = kh/5,
    # deeper penetration by the series-combination factor
    m2, _ = _pad_scene(kh_pad=kh / 4, kh_box=kh)
    pipe2 = CollisionPipeline(m2, hydroelastic=True)
    solver2 = SolverXPBD(m2, iterations=8)
    s2 = m2.state()

    @jax.jit
    def frame2(s):
        def sub(s, _):
            return solver2.step(s, None, ctrl, pipe2.collide(s), dt), None
        return jax.lax.scan(sub, s, None, length=4)[0]

    for _ in range(200):
        s2 = frame2(s2)
    keff2 = (kh / 4) * kh / (kh / 4 + kh)
    delta2 = mass * 9.81 / (keff2 * (2 * H) ** 2)
    pen2 = H - float(s2.body_q[0, 2])
    assert abs(pen2 - delta2) < 0.15 * delta2, (pen2, delta2)


def test_hydro_step_differentiable():
    """jax.grad through a hydroelastic collide+step stays finite, in and
    out of contact (regression: norm/sqrt 0/0 VJPs in the branch-free SDF
    select, the reduction diversity metric, and the cluster-centroid
    division — all NaN'd the backward pass while primals looked fine)."""
    m, H = _pad_scene()
    pipe = CollisionPipeline(m, hydroelastic=True)
    solver = SolverXPBD(m, iterations=4)
    ctrl, dt = m.control(), 1.0 / 240.0

    @jax.jit
    def loss(z0):
        s = m.state()
        s = s.replace(body_q=s.body_q.at[0, 2].set(z0))

        def sub(s, _):
            return solver.step(s, None, ctrl, pipe.collide(s), dt), None

        s = jax.lax.scan(sub, s, None, length=2)[0]
        return jnp.sum(s.body_q[0, 2])

    g = jax.jit(jax.grad(loss))
    for z0 in (H + 0.05, H - 0.005):  # separated / penetrating
        assert np.isfinite(float(g(jnp.float32(z0)))), z0
