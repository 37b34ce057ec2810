"""MPM solver: MLS-MPM on a fixed dense grid with Drucker-Prager sand.

TPU-native re-design of reference
newton/_src/solvers/implicit_mpm/solver_implicit_mpm.py:739 (step :1639,
solve_rheology.py). The reference runs implicit MPM on a rebuildable sparse
warp.fem grid; sparse dynamic grids are hostile to XLA, so this solver uses
the MLS-MPM formulation on a **fixed dense grid** (static shapes, pure
scatter/gather) with the same Drucker-Prager yield surface for granular
media. Dense 64^3 x 4 floats = 4 MiB — cheap in HBM, and every phase (P2G,
grid update, G2P) is one fused vectorized program.

Particle state beyond the core Model arrays (deformation gradient F, affine
velocity C) lives in ``State.custom["mpm:F"/"mpm:C"]``; call
:meth:`SolverImplicitMPM.init_state` once after ``model.state()``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sim.contacts import Contacts
from ..sim.control import Control
from ..sim.model import Model
from ..sim.state import State
from .solver import SolverBase

__all__ = ["SolverImplicitMPM", "SolverMPM"]


class SolverImplicitMPM(SolverBase):
    """MLS-MPM granular/elastic media solver
    (reference: solver_implicit_mpm.py:739).

    Args:
        grid_lower/grid_upper: fixed world-space grid bounds.
        resolution: cells per axis.
        young/poisson: elastic moduli.
        friction_angle: Drucker-Prager friction angle (radians); None for
            purely elastic (jelly-like) material.
        density: particle material density (mass from model arrays).
        material: "sand" (Drucker-Prager return map), "snow" (singular-value
            clamp + plastic-compression hardening, Stomakhin et al. 2013 —
            the reference's per-particle snow rheology,
            example_mpm_snow_ball.py), or "viscous" (plastic relaxation of
            deviatoric elastic strain -> honey-like creeping flow,
            example_mpm_viscous.py).
        snow_theta_c/snow_theta_s: snow critical compression/stretch.
        snow_hardening: exponential hardening coefficient xi.
        viscous_relax: per-step deviatoric strain relaxation rate in [0, 1].
    """

    def __init__(self, model: Model,
                 grid_lower=(-1.0, -1.0, 0.0), grid_upper=(1.0, 1.0, 2.0),
                 resolution: int = 64, young: float = 1.0e5,
                 poisson: float = 0.3, friction_angle: Optional[float] = 0.5,
                 cohesion: float = 0.0, implicit_iterations: int = 0,
                 material: str = "sand",
                 snow_theta_c: float = 2.5e-2, snow_theta_s: float = 7.5e-3,
                 snow_hardening: float = 10.0,
                 viscous_relax: float = 0.5,
                 material_id=None,
                 rheology: str = "explicit",
                 rheology_iterations: int = 16,
                 rheology_compliance: float = 0.0):
        if material not in ("sand", "snow", "viscous"):
            raise ValueError(f"unknown material {material!r}")
        self.material = material
        # per-particle materials (reference: implicit_mpm per-particle
        # rheology, example_mpm_multi_material.py): material_id (N,) int
        # with 0 = sand, 1 = snow, 2 = viscous; overrides ``material``
        self.material_id = None
        if material_id is not None:
            self.material_id = np.asarray(material_id, dtype=np.int32)
            self.material = "mixed"
        self.snow_theta_c = float(snow_theta_c)
        self.snow_theta_s = float(snow_theta_s)
        self.snow_hardening = float(snow_hardening)
        self.viscous_relax = float(viscous_relax)
        super().__init__(model)
        # implicit grid solve: with implicit_iterations > 0 the grid
        # velocities solve (M - D) v = M v* by matrix-free CG, where D is
        # the linearized (small-strain) stress response assembled as a
        # G2P-gradient -> stress -> P2G-force composition. This is the
        # semi-implicit MPM velocity solve (Stomakhin et al. 2013 app.;
        # reference implicit_mpm/solver_implicit_mpm.py:770 solves the same
        # implicit grid problem with its proximal rheology projection) —
        # genuinely implicit, so the elastic CFL limit disappears and sand
        # runs stably at 4x+ the explicit timestep. The operator is SPD by
        # construction (P A P with the wall-BC projector P), and every CG
        # iteration is one P2G/G2P pair — batched, static-shape TPU work.
        # 0 = explicit MLS-MPM.
        self.implicit_iterations = int(implicit_iterations)
        # rheology="implicit": rigid-(visco)plastic Drucker-Prager NCP on
        # the grid (mpm_rheology.solve_rheology_implicit — the reference's
        # solve_rheology.py equivalent). The granular stress becomes a
        # cone-projected grid multiplier field, so the elastic wave CFL
        # disappears entirely: dt is limited by particle advection only
        # (~4x+ the explicit ceiling on sand piles).
        if rheology not in ("explicit", "implicit"):
            raise ValueError(f"unknown rheology {rheology!r}")
        if rheology == "implicit" and material not in ("sand",):
            raise ValueError("rheology='implicit' is the granular "
                             "Drucker-Prager grid solve; it requires "
                             "material='sand'")
        self.rheology = rheology
        self.rheology_iterations = int(rheology_iterations)
        self.rheology_compliance = float(rheology_compliance)
        self.lower = np.asarray(grid_lower, dtype=np.float64)
        self.upper = np.asarray(grid_upper, dtype=np.float64)
        self.res = int(resolution)
        self.dx = float((self.upper - self.lower).max() / self.res)
        self.inv_dx = 1.0 / self.dx
        E, nu = float(young), float(poisson)
        self.mu0 = E / (2 * (1 + nu))
        self.lam0 = E * nu / ((1 + nu) * (1 - 2 * nu))
        self.friction_angle = friction_angle
        self.cohesion = float(cohesion)
        # 27 neighbor offsets for quadratic B-splines
        self._offs = np.array([[i, j, k] for i in range(3) for j in range(3)
                               for k in range(3)], dtype=np.int32)

    # ------------------------------------------------------------------
    def init_state(self, state: State) -> State:
        N = self.model.particle_count
        dtype = state.particle_q.dtype
        custom = dict(state.custom)
        custom["mpm:F"] = jnp.broadcast_to(jnp.eye(3, dtype=dtype),
                                           (N, 3, 3))
        custom["mpm:C"] = jnp.zeros((N, 3, 3), dtype=dtype)
        if self.material in ("snow", "mixed"):
            custom["mpm:Jp"] = jnp.ones((N,), dtype=dtype)
        if self.rheology == "implicit":
            rc = self.res - 1
            custom["mpm:sigma"] = jnp.zeros((rc, rc, rc, 6), dtype=dtype)
        return state.replace(custom=custom)

    # ------------------------------------------------------------------
    def step(self, state_in: State, state_out: Optional[State] = None,
             control: Optional[Control] = None,
             contacts: Optional[Contacts] = None, dt: float = 1e-3) -> State:
        model = self.model
        N = model.particle_count
        if N == 0:
            return state_in
        dtype = state_in.particle_q.dtype
        if "mpm:F" not in state_in.custom:
            state_in = self.init_state(state_in)

        x = state_in.particle_q
        v = state_in.particle_qd
        F = state_in.custom["mpm:F"]
        C = state_in.custom["mpm:C"]
        m = model.particle_mass
        vol0 = (0.5 * self.dx) ** 3  # nominal particle volume

        res = self.res
        lower = jnp.asarray(self.lower, dtype=dtype)
        inv_dx = jnp.asarray(self.inv_dx, dtype=dtype)
        dx = jnp.asarray(self.dx, dtype=dtype)

        # --- stress (fixed corotated + per-material plastic projection) ---
        Jp = state_in.custom.get("mpm:Jp")

        def projected_stress(F_in):
            """(F_projected, P(F) F^T, Jp_new) with plasticity applied."""
            U, sig, Vt = _svd3(F_in)
            mu_p = self.mu0
            lam_p = self.lam0
            Jp_new = Jp
            if self.material == "snow":
                # Stomakhin snow: clamp singular values to the elastic
                # region, fold the clipped volume change into Jp, and harden
                # the moduli exponentially with plastic compression
                sig_c = jnp.clip(sig, 1.0 - self.snow_theta_c,
                                 1.0 + self.snow_theta_s)
                Jp_new = jnp.clip(
                    Jp * jnp.prod(sig, axis=-1) / jnp.maximum(
                        jnp.prod(sig_c, axis=-1), 1e-9), 0.1, 10.0)
                h = jnp.exp(jnp.clip(
                    self.snow_hardening * (1.0 - Jp_new), -5.0, 5.0))
                mu_p = self.mu0 * h[:, None, None]
                lam_p = self.lam0 * h[:, None, None]
                sig = sig_c
                F_p = jnp.einsum("nij,nj,njk->nik", U, sig, Vt)
            elif self.material == "viscous":
                # plastic relaxation of deviatoric stretch: pull the
                # singular values toward their isotropic mean each step ->
                # creeping honey-like flow with volume preservation
                mean = jnp.prod(sig, axis=-1,
                                keepdims=True) ** (1.0 / 3.0)
                sig = sig + self.viscous_relax * (mean - sig)
                F_p = jnp.einsum("nij,nj,njk->nik", U, sig, Vt)
            elif self.material == "mixed":
                # per-particle material select: all three projections are
                # cheap vector ops on the shared SVD
                mid = jnp.asarray(self.material_id)
                fa = 0.5 if self.friction_angle is None else \
                    self.friction_angle
                sig_sand = _drucker_prager_project(sig, fa, self.cohesion)
                sig_c = jnp.clip(sig, 1.0 - self.snow_theta_c,
                                 1.0 + self.snow_theta_s)
                Jp_snow = jnp.clip(
                    Jp * jnp.prod(sig, axis=-1) / jnp.maximum(
                        jnp.prod(sig_c, axis=-1), 1e-9), 0.1, 10.0)
                h = jnp.exp(jnp.clip(
                    self.snow_hardening * (1.0 - Jp_snow), -5.0, 5.0))
                mean = jnp.prod(sig, axis=-1,
                                keepdims=True) ** (1.0 / 3.0)
                sig_v = sig + self.viscous_relax * (mean - sig)
                sig = jnp.where((mid == 1)[:, None], sig_c,
                                jnp.where((mid == 2)[:, None], sig_v,
                                          sig_sand))
                Jp_new = jnp.where(mid == 1, Jp_snow, Jp)
                hmul = jnp.where(mid == 1, h, 1.0)
                mu_p = self.mu0 * hmul[:, None, None]
                lam_p = self.lam0 * hmul[:, None, None]
                F_p = jnp.einsum("nij,nj,njk->nik", U, sig, Vt)
            elif self.friction_angle is not None:
                sig = _drucker_prager_project(sig, self.friction_angle,
                                              self.cohesion)
                F_p = jnp.einsum("nij,nj,njk->nik", U, sig, Vt)
            else:
                F_p = F_in
            J = jnp.prod(sig, axis=-1)
            R = jnp.einsum("nij,njk->nik", U, Vt)
            lam_term = lam_p * J * (J - 1.0) if np.isscalar(lam_p) \
                else lam_p[:, 0, 0] * J * (J - 1.0)
            PFt = (2 * mu_p * jnp.einsum("nij,nkj->nik", F_p - R, F_p)
                   + lam_term[:, None, None] * jnp.eye(3, dtype=dtype))
            return F_p, PFt, Jp_new

        F, PFt, Jp_new = projected_stress(F)
        stress_coeff = (-dt * vol0 * 4.0 * inv_dx * inv_dx)
        if self.rheology == "implicit":
            # granular stress lives on the grid (solve below); particles
            # carry only mass/momentum/APIC. F stays DP-projected above
            # purely as a volume tracker.
            affine = m[:, None, None] * C
        else:
            affine = stress_coeff * PFt + m[:, None, None] * C

        # --- P2G ---
        xp = (x - lower) * inv_dx
        base = jnp.floor(xp - 0.5).astype(jnp.int32)         # (N, 3)
        fx = xp - base.astype(dtype)                          # in [0.5, 1.5]
        # quadratic B-spline weights per axis: offsets 0, 1, 2
        w0 = 0.5 * (1.5 - fx) ** 2
        w1 = 0.75 - (fx - 1.0) ** 2
        w2 = 0.5 * (fx - 0.5) ** 2
        w_ax = jnp.stack([w0, w1, w2], axis=1)                # (N, 3, 3axis)

        ncell = res ** 3
        tb = getattr(self, "transfer_backend", "auto")
        use_pallas = (tb == "pallas"
                      or (tb == "auto" and jax.default_backend() == "tpu"))
        interp = jax.default_backend() != "tpu"
        w_idx = np.maximum(model.structure.particle_world, 0)
        g_vec = jnp.mean(model.gravity[w_idx], axis=0)  # grid-level gravity
        ii = jnp.arange(res)
        gx3, gy3, gz3 = jnp.meshgrid(ii, ii, ii, indexing="ij")
        gxf, gyf, gzf = (gx3.reshape(-1), gy3.reshape(-1), gz3.reshape(-1))
        bound = 3

        if use_pallas:
            Np = (-N) % 512
            basep = jnp.concatenate(
                [base, jnp.zeros((Np, 3), jnp.int32)]) if Np else base
            waxp = jnp.concatenate(
                [w_ax, jnp.zeros((Np, 3, 3), dtype)]) if Np else w_ax
            iif = jnp.arange(res, dtype=dtype)
            crd = jnp.stack(jnp.meshgrid(iif, iif, iif, indexing="ij"),
                            axis=-1).reshape(ncell, 3)       # node coords
        else:
            offs = jnp.asarray(self._offs)                    # (27, 3)
            cell = base[:, None, :] + offs[None, :, :]        # (N, 27, 3)
            cell = jnp.clip(cell, 0, res - 1)
            w = (w_ax[:, offs[:, 0], 0] * w_ax[:, offs[:, 1], 1]
                 * w_ax[:, offs[:, 2], 2])                    # (N, 27)
            dpos = (offs[None].astype(dtype) - fx[:, None, :]) * dx
            flat = (cell[..., 0] * res + cell[..., 1]) * res + cell[..., 2]

        def p2g_grid(affine, with_mass_vel):
            """P2G of the per-particle affine (+ optional mass/velocity).
            Returns (grid_mass or None, grid_mom)."""
            if use_pallas:
                # separable-stencil MXU transfer (mpm_pallas.py): channels
                # [mass | mv - dx*A@xp | dx*A (9 cols)]; the node-position
                # factor of the APIC term recombines on the grid
                from .mpm_pallas import p2g_apply
                c0 = -dx * jnp.einsum("nij,nj->ni", affine, xp)
                if with_mass_vel:
                    c0 = c0 + m[:, None] * v
                mass_ch = m[:, None] if with_mass_vel \
                    else jnp.zeros((N, 1), dtype)
                # 14th zero channel pads the kernel's lane axis to a
                # multiple of 128 (14 * res = 896 = 7 * 128 at res 64)
                vals = jnp.concatenate(
                    [mass_ch, c0, (dx * affine).reshape(N, 9),
                     jnp.zeros((N, 1), dtype)], axis=1)
                if Np:
                    vals = jnp.concatenate([vals,
                                            jnp.zeros((Np, 14), dtype)])
                G = p2g_apply(basep, waxp, vals, res,
                              interpret=interp).reshape(ncell, 14)
                A_g = G[:, 4:13].reshape(ncell, 3, 3)
                grid_mom = G[:, 1:4] + jnp.einsum("cde,ce->cd", A_g, crd)
                return (G[:, 0] if with_mass_vel else None), grid_mom
            mom_p = jnp.einsum("nij,nkj->nki", affine, dpos)
            if with_mass_vel:
                mom_p = mom_p + m[:, None, None] * v[:, None, :]
            grid_mom = jax.ops.segment_sum(
                (w[..., None] * mom_p).reshape(-1, 3), flat.reshape(-1),
                ncell)
            grid_mass = jax.ops.segment_sum(
                (w * m[:, None]).reshape(-1), flat.reshape(-1), ncell) \
                if with_mass_vel else None
            return grid_mass, grid_mom

        def bc(gv):
            """Wall boundary projection (zero inward normal velocity)."""
            gv = gv.at[:, 0].set(jnp.where(
                ((gxf < bound) & (gv[:, 0] < 0))
                | ((gxf >= res - bound) & (gv[:, 0] > 0)), 0.0, gv[:, 0]))
            gv = gv.at[:, 1].set(jnp.where(
                ((gyf < bound) & (gv[:, 1] < 0))
                | ((gyf >= res - bound) & (gv[:, 1] > 0)), 0.0, gv[:, 1]))
            gv = gv.at[:, 2].set(jnp.where(
                ((gzf < bound) & (gv[:, 2] < 0))
                | ((gzf >= res - bound) & (gv[:, 2] > 0)), 0.0, gv[:, 2]))
            return gv

        def g2p(gv):
            """G2P: particle velocities + affine velocity gradients."""
            if use_pallas:
                from .mpm_pallas import g2p_apply
                # channels: [gv | gv*I | gv*J | gv*K] — the node-position
                # factor of the C update separates as in P2G
                gv_grid = gv.reshape(res, res, res, 3)
                gch = jnp.concatenate(
                    [gv_grid] + [gv_grid
                                 * crd.reshape(res, res, res, 3)[..., e:e + 1]
                                 for e in range(3)], axis=-1)  # (r, r, r, 12)
                P = g2p_apply(basep, waxp, gch, interpret=interp)[:N]
                v_new = P[:, 0:3]
                S_ne = P[:, 3:12].reshape(N, 3, 3)           # [e, d]
                C_new = (4.0 * inv_dx * inv_dx * dx
                         * (jnp.swapaxes(S_ne, 1, 2)
                            - v_new[:, :, None] * xp[:, None, :]))
            else:
                gv_n = gv[flat]                              # (N, 27, 3)
                v_new = jnp.einsum("nk,nkx->nx", w, gv_n)
                C_new = 4.0 * inv_dx * inv_dx * jnp.einsum(
                    "nk,nkx,nky->nxy", w, gv_n, dpos)
            return v_new, C_new

        grid_mass, grid_mom = p2g_grid(affine, with_mass_vel=True)
        has_mass = grid_mass > 1e-10
        gv = grid_mom / jnp.maximum(grid_mass, 1e-10)[:, None]
        gv = gv + dt * g_vec[None, :]
        gv = jnp.where(has_mass[:, None], gv, 0.0)
        gv = bc(gv)

        # LINEAR wall/mass projector shared by both implicit grid solves:
        # zero normal components in the wall bands, zero on massless nodes
        # (the sign-aware clamp in bc() is nonlinear and would destroy the
        # SPD-ness the iterations depend on)
        wall_x = (gxf < bound) | (gxf >= res - bound)
        wall_y = (gyf < bound) | (gyf >= res - bound)
        wall_z = (gzf < bound) | (gzf >= res - bound)

        def lin_proj(u):
            u = u * has_mass[:, None]
            u = u.at[:, 0].set(jnp.where(wall_x, 0.0, u[:, 0]))
            u = u.at[:, 1].set(jnp.where(wall_y, 0.0, u[:, 1]))
            u = u.at[:, 2].set(jnp.where(wall_z, 0.0, u[:, 2]))
            return u

        sigma_new = None
        if self.rheology == "implicit":
            # rigid-(visco)plastic Drucker-Prager NCP on the grid
            # (reference: implicit_mpm/solve_rheology.py); warm-started
            # from the previous step's multiplier field
            from .mpm_rheology import solve_rheology_implicit
            fa = 0.5 if self.friction_angle is None else \
                float(self.friction_angle)
            gv, sigma_new = solve_rheology_implicit(
                lin_proj(gv), grid_mass, has_mass, lin_proj, res,
                inv_dx, dt, vol_cell=self.dx ** 3,
                mu_f=float(np.tan(fa)), cohesion=self.cohesion,
                sigma0=state_in.custom.get("mpm:sigma"),
                iterations=self.rheology_iterations,
                compliance=self.rheology_compliance)
            gv = bc(gv)

        if self.implicit_iterations > 0 and self.rheology != "implicit":
            # semi-implicit velocity solve (see __init__): CG on
            #   A(u) = P(m u - D(P u)) + (I - P) u
            #   D(u) = P2G(coeff * sigma_lin(grad u))
            # with sigma_lin the small-strain elastic tangent and P a LINEAR
            # projector (zero normal components in the wall bands, zero on
            # massless cells). The sign-aware wall clamp used on the
            # explicit path is nonlinear and would silently destroy the
            # SPD-ness CG depends on (found the hard way: CG diverged).
            eye3 = jnp.eye(3, dtype=dtype)
            m_safe = jnp.maximum(grid_mass, 1e-10)[:, None]
            proj = lin_proj

            def D_op(u):
                _, C_u = g2p(u)
                sym = 0.5 * (C_u + jnp.swapaxes(C_u, 1, 2))
                trc = (C_u[:, 0, 0] + C_u[:, 1, 1]
                       + C_u[:, 2, 2])[:, None, None]
                sig_lin = dt * (2.0 * self.mu0 * sym
                                + self.lam0 * trc * eye3[None])
                _, mom = p2g_grid(stress_coeff * sig_lin,
                                  with_mass_vel=False)
                return mom

            def A_op(u):
                pu = proj(u)
                return proj(m_safe * pu - D_op(pu)) + (u - pu)

            b_rhs = proj(m_safe * gv)
            u = proj(gv)
            r = b_rhs - A_op(u)
            p = r
            rs = jnp.sum(r * r)

            def cg_body(carry, _):
                u, r, p, rs = carry
                Ap = A_op(p)
                alpha = rs / jnp.maximum(jnp.sum(p * Ap), 1e-20)
                u = u + alpha * p
                r = r - alpha * Ap
                rs_new = jnp.sum(r * r)
                beta = rs_new / jnp.maximum(rs, 1e-20)
                p = r + beta * p
                return (u, r, p, rs_new), None

            (u, _, _, _), _ = jax.lax.scan(
                cg_body, (u, r, p, rs), None,
                length=self.implicit_iterations)
            gv = proj(u)

        v_new, C_new = g2p(gv)
        x_new = x + dt * v_new
        F_new = jnp.einsum("nij,njk->nik",
                           jnp.eye(3, dtype=dtype)[None] + dt * C_new, F)

        # keep fixed (inv_mass == 0) particles pinned
        active = (model.particle_inv_mass > 0)[:, None]
        x_new = jnp.where(active, x_new, x)
        v_new = jnp.where(active, v_new, v)

        custom = dict(state_in.custom)
        custom["mpm:F"] = F_new
        custom["mpm:C"] = C_new
        if self.material in ("snow", "mixed"):
            custom["mpm:Jp"] = Jp_new
        if sigma_new is not None:
            custom["mpm:sigma"] = sigma_new
        return state_in.replace(particle_q=x_new, particle_qd=v_new,
                                custom=custom)


SolverMPM = SolverImplicitMPM


def _svd3(F):
    """Batched 3x3 SVD with sign correction (proper rotations).

    TPU: fixed-sweep componentwise Jacobi eigensolver on F^T F + polar
    recovery of U — branch-free with a static iteration count.
    ``jnp.linalg.svd`` lowers to a data-dependent while loop on TPU that
    cost ~35 ms/step on real MPM deformation data (profiled); four Jacobi
    sweeps match it to ~1e-6 on the well-conditioned F of an MPM step.
    CPU: LAPACK svd (the ~900-op componentwise graph takes minutes to
    compile in single-core XLA CPU builds).
    """
    if jax.default_backend() != "tpu":
        U, s, Vt = jnp.linalg.svd(F)
        det_u = jnp.linalg.det(U)
        det_v = jnp.linalg.det(Vt)
        U = U.at[:, :, 2].multiply(jnp.sign(det_u)[:, None])
        Vt = Vt.at[:, 2, :].multiply(jnp.sign(det_v)[:, None])
        s = s.at[:, 2].multiply(jnp.sign(det_u * det_v))
        return U, s, Vt
    return _svd3_jacobi(F)


def _svd3_jacobi(F):
    """Componentwise fixed-sweep Jacobi SVD (see _svd3)."""
    # componentwise (transposed-SoA): every quantity is a (N,) array so the
    # whole solve is lane-packed elementwise VPU work — (N, 3, 3) matrix
    # einsums pad 3 onto the 128-lane axis and run at <3% utilization
    f = [[F[:, i, j] for j in range(3)] for i in range(3)]
    # S = F^T F (6 unique components)
    s00 = f[0][0] * f[0][0] + f[1][0] * f[1][0] + f[2][0] * f[2][0]
    s11 = f[0][1] * f[0][1] + f[1][1] * f[1][1] + f[2][1] * f[2][1]
    s22 = f[0][2] * f[0][2] + f[1][2] * f[1][2] + f[2][2] * f[2][2]
    s01 = f[0][0] * f[0][1] + f[1][0] * f[1][1] + f[2][0] * f[2][1]
    s02 = f[0][0] * f[0][2] + f[1][0] * f[1][2] + f[2][0] * f[2][2]
    s12 = f[0][1] * f[0][2] + f[1][1] * f[1][2] + f[2][1] * f[2][2]
    one = jnp.ones_like(s00)
    zero = jnp.zeros_like(s00)
    # V columns as component triples
    V = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]
    # V[i][j] = row i, col j

    def rot_cols(cp, cq, c, s):
        """(Vp, Vq) <- (c Vp - s Vq, s Vp + c Vq) componentwise."""
        return ([c * a - s * b for a, b in zip(cp, cq)],
                [s * a + c * b for a, b in zip(cp, cq)])

    def sweep(S6, V):
        s00, s11, s22, s01, s02, s12 = S6
        # (0,1), r=2
        th = 0.5 * jnp.arctan2(2.0 * s01, s11 - s00)
        c, s = jnp.cos(th), jnp.sin(th)
        a, b, d, e, fq = s00, s11, s01, s02, s12
        s00 = c * c * a - 2 * c * s * d + s * s * b
        s11 = s * s * a + 2 * c * s * d + c * c * b
        s01 = c * s * (a - b) + (c * c - s * s) * d
        s02 = c * e - s * fq
        s12 = s * e + c * fq
        cp, cq = rot_cols([V[0][0], V[1][0], V[2][0]],
                          [V[0][1], V[1][1], V[2][1]], c, s)
        for i in range(3):
            V[i][0], V[i][1] = cp[i], cq[i]
        # (0,2), r=1
        th = 0.5 * jnp.arctan2(2.0 * s02, s22 - s00)
        c, s = jnp.cos(th), jnp.sin(th)
        a, b, d, e, fq = s00, s22, s02, s01, s12
        s00 = c * c * a - 2 * c * s * d + s * s * b
        s22 = s * s * a + 2 * c * s * d + c * c * b
        s02 = c * s * (a - b) + (c * c - s * s) * d
        s01 = c * e - s * fq
        s12 = s * e + c * fq
        cp, cq = rot_cols([V[0][0], V[1][0], V[2][0]],
                          [V[0][2], V[1][2], V[2][2]], c, s)
        for i in range(3):
            V[i][0], V[i][2] = cp[i], cq[i]
        # (1,2), r=0
        th = 0.5 * jnp.arctan2(2.0 * s12, s22 - s11)
        c, s = jnp.cos(th), jnp.sin(th)
        a, b, d, e, fq = s11, s22, s12, s01, s02
        s11 = c * c * a - 2 * c * s * d + s * s * b
        s22 = s * s * a + 2 * c * s * d + c * c * b
        s12 = c * s * (a - b) + (c * c - s * s) * d
        s01 = c * e - s * fq
        s02 = s * e + c * fq
        cp, cq = rot_cols([V[0][1], V[1][1], V[2][1]],
                          [V[0][2], V[1][2], V[2][2]], c, s)
        for i in range(3):
            V[i][1], V[i][2] = cp[i], cq[i]
        return (s00, s11, s22, s01, s02, s12), V

    S6 = (s00, s11, s22, s01, s02, s12)
    for _ in range(4):
        S6, V = sweep(S6, V)
    eig = [S6[0], S6[1], S6[2]]

    def colswap(i, j):
        do = eig[i] < eig[j]
        eig[i], eig[j] = (jnp.where(do, eig[j], eig[i]),
                          jnp.where(do, eig[i], eig[j]))
        for r in range(3):
            vi, vj = V[r][i], V[r][j]
            V[r][i] = jnp.where(do, vj, vi)
            V[r][j] = jnp.where(do, vi, vj)

    colswap(0, 1)
    colswap(0, 2)
    colswap(1, 2)
    sig = [jnp.sqrt(jnp.maximum(e, 0.0)) for e in eig]
    # column swaps may flip det(V); flip col 2 back to a proper rotation
    detV = (V[0][0] * (V[1][1] * V[2][2] - V[1][2] * V[2][1])
            - V[0][1] * (V[1][0] * V[2][2] - V[1][2] * V[2][0])
            + V[0][2] * (V[1][0] * V[2][1] - V[1][1] * V[2][0]))
    sgn = jnp.where(detV < 0.0, -1.0, 1.0)
    for r in range(3):
        V[r][2] = V[r][2] * sgn

    # U columns from F V with Gram-Schmidt; right-handed u2 pushes
    # sign(det F) into sig[2]
    def matcol(M, col):
        return [sum(M[r][k] * col[k] for k in range(3)) for r in range(3)]

    FV = [matcol(f, [V[0][j], V[1][j], V[2][j]]) for j in range(3)]

    def norm3(v):
        return jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])

    u0 = [x / jnp.maximum(sig[0], 1e-9) for x in FV[0]]
    n0 = jnp.maximum(norm3(u0), 1e-9)
    u0 = [x / n0 for x in u0]
    d01 = sum(a * b for a, b in zip(FV[1], u0))
    u1 = [a - d01 * b for a, b in zip(FV[1], u0)]
    n1 = jnp.maximum(norm3(u1), 1e-9)
    u1 = [x / n1 for x in u1]
    u2 = [u0[1] * u1[2] - u0[2] * u1[1],
          u0[2] * u1[0] - u0[0] * u1[2],
          u0[0] * u1[1] - u0[1] * u1[0]]
    s2_sign = jnp.where(sum(a * b for a, b in zip(u2, FV[2])) < 0.0,
                        -1.0, 1.0)
    sig2 = sig[2] * s2_sign

    U = jnp.stack([jnp.stack(u0, axis=-1), jnp.stack(u1, axis=-1),
                   jnp.stack(u2, axis=-1)], axis=-1)
    sig_out = jnp.stack([sig[0], sig[1], sig2], axis=-1)
    Vt = jnp.stack([jnp.stack([V[0][j], V[1][j], V[2][j]], axis=-1)
                    for j in range(3)], axis=1)
    return U, sig_out, Vt


def _drucker_prager_project(sig, friction_angle, cohesion):
    """Return-map the principal stretches onto the Drucker-Prager cone
    (reference: implicit_mpm/solve_rheology.py, Klar et al. 2016)."""
    alpha = jnp.sqrt(2.0 / 3.0) * 2.0 * jnp.sin(friction_angle) / (
        3.0 - jnp.sin(friction_angle))
    eps = jnp.log(jnp.maximum(sig, 1e-6)) - cohesion
    tr = jnp.sum(eps, axis=-1, keepdims=True)
    dev = eps - tr / 3.0
    dev_norm = jnp.linalg.norm(dev, axis=-1, keepdims=True)
    # expansion: project to tip; yielding: scale back deviator
    dg = dev_norm + alpha * tr
    scale = jnp.where(dev_norm > 1e-9,
                      jnp.maximum(1.0 - dg / jnp.maximum(dev_norm, 1e-9), 0.0),
                      0.0)
    eps_proj = jnp.where(tr > 0, jnp.zeros_like(eps),
                         jnp.where(dg > 0, dev * scale + tr / 3.0, eps))
    return jnp.exp(eps_proj + cohesion)
