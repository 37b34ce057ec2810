"""Implicit Drucker-Prager rheology solve on the MPM grid.

The reference solves granular flow implicitly: per-strain-node vec6
stresses constrained to the Drucker-Prager yield set, complementarity
with the grid strain rate, iterated with projected Gauss-Seidel/Jacobi
against a Delassus operator (reference:
newton/_src/solvers/implicit_mpm/solve_rheology.py — RheologyData holds
per-node yield_params, _DelassusOperator applies stress<->velocity
deltas, _JacobiSolver/_GaussSeidelSolver run the projected sweep).
Because the grid solve is rigid-(visco)plastic, there is NO elastic wave
CFL — the stable dt is set by particle advection alone, ~4x or more
beyond the explicit ceiling.

TPU-native formulation (not a port):

- **Strain nodes are grid cells** (the reference uses the FEM strain
  space). Stress sigma lives as a dense (res, res, res, 6) field; the
  strain-rate operator E (node velocities -> cell sym-grad) and its
  exact adjoint E^T (cell stress -> nodal force) are half-cell staggered
  finite-difference stencils — pure `jnp.roll`/slice arithmetic that XLA
  fuses into a handful of VPU passes. No gathers, no per-iteration
  particle transfers, cost independent of particle count.
- **Projected Jacobi with a power-iteration step cap**, the same scheme
  as the rigid-contact PGS (`generalized/pgs_pallas.py`): 3 power
  iterations + Rayleigh quotient bound lambda_max of the
  diagonally-scaled Delassus, then `iters` sweeps of
  ``sigma <- proj_DP(sigma - step * E u(sigma))``.
- **Warm start**: sigma persists in ``State.custom["mpm:sigma"]``; pile
  states converge in a handful of sweeps.

The Drucker-Prager projection is the analytic SOC projection in
(pressure, deviator) space: q = -tr(sigma)/3 >= 0, |dev sigma|_F <=
mu_f * q + c (Daviet & Bertails-Descoubes 2016 DP(mu) law; Klar et al.
2016 yield surface).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["solve_rheology_implicit"]

# vec6 layout: [xx, yy, zz, sqrt2*xy, sqrt2*yz, sqrt2*xz] — the sqrt(2)
# scaling makes the Frobenius norm of the symmetric matrix equal the
# euclidean norm of the vec6, so cone projections are plain vector math.
_SQRT2 = 1.4142135623730951


def _sym_grad(u, inv_dx):
    """E: node velocities (r, r, r, 3) -> cell strain rate (r-1,..., 6).

    Cells sit at half-offsets between nodes; du_a/dx_b at a cell is the
    average over the 4 node-pairs straddling it along axis b — the
    standard staggered trilinear gradient, exact adjoint of `_div`."""

    def face_avg(f, axis):
        """Average the 8 cell-corner node values down to the cell except
        along `axis`, where the forward difference is taken."""
        for ax in range(3):
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[ax] = slice(0, -1)
            hi[ax] = slice(1, None)
            if ax == axis:
                f = (f[tuple(hi)] - f[tuple(lo)]) * inv_dx
            else:
                f = 0.5 * (f[tuple(hi)] + f[tuple(lo)])
        return f

    g = [[face_avg(u[..., a], b) for b in range(3)] for a in range(3)]
    exx, eyy, ezz = g[0][0], g[1][1], g[2][2]
    exy = 0.5 * (g[0][1] + g[1][0])
    eyz = 0.5 * (g[1][2] + g[2][1])
    exz = 0.5 * (g[0][2] + g[2][0])
    return jnp.stack([exx, eyy, ezz, _SQRT2 * exy, _SQRT2 * eyz,
                      _SQRT2 * exz], axis=-1)


def _div(sig, inv_dx):
    """E^T: cell stress (r-1,..., 6) -> nodal force (r, r, r, 3).

    Built as the EXACT adjoint of `_sym_grad` (pad + reversed stencils),
    so the Delassus operator E M^-1 E^T is symmetric PSD by
    construction — the projected sweep's convergence theory needs it."""

    def scatter(f, axis):
        # adjoint of face_avg: pad with zeros, reversed difference /
        # average along each axis
        for ax in range(2, -1, -1):
            pad = [(0, 0)] * f.ndim
            pad[ax] = (1, 1)
            fp = jnp.pad(f, pad)
            lo = [slice(None)] * f.ndim
            hi = [slice(None)] * f.ndim
            lo[ax] = slice(0, -1)
            hi[ax] = slice(1, None)
            if ax == axis:
                f = (fp[tuple(lo)] - fp[tuple(hi)]) * inv_dx
            else:
                f = 0.5 * (fp[tuple(lo)] + fp[tuple(hi)])
        return f

    out = []
    for a in range(3):
        comps = {0: sig[..., 0], 1: sig[..., 1], 2: sig[..., 2]}
        # off-diagonal contributions: sym-grad put 0.5*sqrt2 of each
        # cross derivative into the vec6 slot; adjoint returns
        # (sqrt2/2) * slot into both (a, b) gradients
        off = {(0, 1): sig[..., 3], (1, 0): sig[..., 3],
               (1, 2): sig[..., 4], (2, 1): sig[..., 4],
               (0, 2): sig[..., 5], (2, 0): sig[..., 5]}
        acc = scatter(comps[a], a) if a in comps else 0.0
        for b in range(3):
            if b == a:
                continue
            acc = acc + (_SQRT2 / 2.0) * scatter(off[(a, b)], b)
        out.append(acc)
    return jnp.stack(out, axis=-1)


def _proj_dp(sig, mu_f, cohesion):
    """Project vec6 multipliers onto the Drucker-Prager cone.

    The solve stores lam = -sigma_physical (a contact-force-like
    multiplier: COMPRESSION has POSITIVE trace, exactly like a contact
    normal impulse is positive), which keeps the projected-Jacobi update
    ``lam <- proj(lam - step * strain_rate)`` in the same form as the
    rigid-contact PGS. Feasible set: q = tr/3 >= 0 (pressure),
    |dev|_F <= mu_f * q + c. Analytic second-order-cone projection
    (apex handling included)."""
    tr = sig[..., 0] + sig[..., 1] + sig[..., 2]
    q = tr / 3.0                                        # pressure, >=0 inside
    dev = sig.at[..., 0].add(-q).at[..., 1].add(-q).at[..., 2].add(-q)
    sn = jnp.sqrt(jnp.sum(dev * dev, axis=-1) + 1e-30)  # |dev|_F

    # shift by cohesion: work with q' = q + c/mu (cone through origin)
    mu = jnp.maximum(mu_f, 1e-6)
    q0 = cohesion / mu
    qs = q + q0

    inside = sn <= mu * qs
    apex = qs + mu * sn <= 0.0
    # cone-surface projection of (qs, sn): closest point on sn = mu*qs
    t = (qs + mu * sn) / (1.0 + mu * mu)
    q_new = jnp.where(inside, qs, jnp.where(apex, 0.0, t)) - q0
    scale = jnp.where(inside, 1.0,
                      jnp.where(apex, 0.0,
                                mu * t / jnp.maximum(sn, 1e-30)))
    out = dev * scale[..., None]
    out = out.at[..., 0].add(q_new).at[..., 1].add(q_new).at[..., 2].add(
        q_new)
    return out


def solve_rheology_implicit(gv_free, grid_mass, has_mass, proj, res,
                            inv_dx, dt, vol_cell, mu_f, cohesion,
                            sigma0=None, iterations=16, relaxation=1.0,
                            compliance=0.0):
    """Implicit DP grid solve: returns (grid velocities, stress field).

    gv_free: (ncell, 3) flat free grid velocities (post gravity + BC
    projection); grid_mass (ncell,); proj: the LINEAR wall/mass
    projector from the caller (zero normal components in wall bands,
    zero on massless nodes); sigma0: warm-start (res-1)^3 x 6 multiplier
    field or None. ``compliance`` adds a diagonal visco-plastic term
    (0 = rigid-plastic).

    Unknown lam = -sigma_physical (see `_proj_dp`): the nodal force is
    +vol * E^T lam (a compression multiplier pushes nodes apart, like a
    contact impulse), and the fixed point
    ``lam = proj_DP(lam - step * E u(lam))`` with
    ``u(lam) = proj(gv_free + dt*vol/m * E^T lam)`` is the granular
    velocity-level NCP.
    """
    dtype = gv_free.dtype
    rc = res - 1
    m_safe = jnp.maximum(grid_mass, 1e-10)[:, None]
    coeff = dt * vol_cell

    def u_of(sig):
        f = _div(sig, inv_dx).reshape(-1, 3)            # nodal force/vol
        du = coeff * f / m_safe
        return proj(gv_free + du).reshape(res, res, res, 3)

    def strain(u):
        return _sym_grad(u, inv_dx)                     # (rc, rc, rc, 6)

    if sigma0 is None:
        sigma = jnp.zeros((rc, rc, rc, 6), dtype)
    else:
        sigma = sigma0

    # matrix-free Delassus: D(sig) = coeff * E M^-1 E^T sig
    def Dop(sig):
        f = _div(sig, inv_dx).reshape(-1, 3)
        du = proj(coeff * f / m_safe).reshape(res, res, res, 3)
        return strain(du) + compliance * sig

    # Exact Delassus diagonal, analytic: every E-row coefficient has
    # magnitude inv_dx/4 per corner node (the sqrt2 vec6 scaling makes all
    # six components' squared-coefficient sums identical), so
    # D_cc = coeff * inv_dx^2/16 * sum_{8 corner nodes} 1/m. Near-massless
    # fringe nodes make a single global step hopeless (their 1/m dominates
    # lambda_max); per-cell diagonal scaling is what keeps interior cells
    # converging — the reference scales per-environment/per-node for the
    # same reason (solve_rheology.py:107 tolerance scales,
    # jacobi_preconditioner).
    inv_m = jnp.where(grid_mass > 1e-10, 1.0 / m_safe[:, 0], 0.0)
    inv_m3 = inv_m.reshape(res, res, res)
    for ax in range(3):
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[ax] = slice(0, -1)
        hi[ax] = slice(1, None)
        inv_m3 = inv_m3[tuple(lo)] + inv_m3[tuple(hi)]
    diag = (coeff * inv_dx * inv_dx / 16.0) * inv_m3 + compliance
    # cells with no adjacent mass never receive strain; park their scale
    diag = jnp.maximum(diag, 1e-20)[..., None]          # (rc, rc, rc, 1)

    # spectral cap of the diagonally-scaled operator (3 power iterations +
    # Rayleigh quotient, as in pgs_pallas.pgs_core). Start from an
    # in-range vector: Dop applied to a deterministic non-uniform field
    # (a uniform field is in the null space of E^T — div of a constant
    # stress is zero — and would estimate lambda_max = 0).
    inv_sqrt_d = jax.lax.rsqrt(diag)
    seed = jnp.sin(jnp.arange(rc * rc * rc * 6, dtype=dtype) * 12.9898)
    u = Dop(seed.reshape(rc, rc, rc, 6))
    u = u / jnp.maximum(jnp.sqrt(jnp.sum(u * u)), 1e-30)
    lam_max = None
    for it in range(3):
        u2 = inv_sqrt_d * Dop(inv_sqrt_d * u)
        nrm = jnp.sqrt(jnp.sum(u2 * u2))
        if it == 2:
            lam_max = nrm            # ||A u||: tighter than <u, A u> (C-S)
        u = u2 / jnp.maximum(nrm, 1e-30)
    scale = jnp.minimum(1.0, 1.8 / jnp.maximum(1.1 * lam_max, 1e-9))
    step = (relaxation * scale) / diag                  # (rc, rc, rc, 1)

    def body(sigma, _):
        uu = u_of(sigma)
        e = strain(uu) + compliance * sigma
        sigma = _proj_dp(sigma - step * e, mu_f, cohesion)
        sigma = jnp.where(jnp.isfinite(sigma), sigma, 0.0)
        return sigma, None

    sigma, _ = jax.lax.scan(body, sigma, None, length=iterations)
    uu = u_of(sigma)
    return uu.reshape(-1, 3), sigma
