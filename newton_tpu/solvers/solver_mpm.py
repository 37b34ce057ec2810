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
    """

    def __init__(self, model: Model,
                 grid_lower=(-1.0, -1.0, 0.0), grid_upper=(1.0, 1.0, 2.0),
                 resolution: int = 64, young: float = 1.0e5,
                 poisson: float = 0.3, friction_angle: Optional[float] = 0.5,
                 cohesion: float = 0.0):
        super().__init__(model)
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

        # --- stress (fixed corotated + Drucker-Prager return map on F) ---
        U, sig, Vt = _svd3(F)
        if self.friction_angle is not None:
            sig = _drucker_prager_project(sig, self.friction_angle,
                                          self.cohesion)
            F = jnp.einsum("nij,nj,njk->nik", U, sig, Vt)
        J = jnp.prod(sig, axis=-1)
        R = jnp.einsum("nij,njk->nik", U, Vt)
        # P(F) F^T for fixed corotated model
        PFt = (2 * self.mu0 * jnp.einsum("nij,nkj->nik", F - R, F)
               + (self.lam0 * J * (J - 1.0))[:, None, None]
               * jnp.eye(3, dtype=dtype))
        stress_coeff = (-dt * vol0 * 4.0 * inv_dx * inv_dx)
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

        offs = jnp.asarray(self._offs)                        # (27, 3)
        cell = base[:, None, :] + offs[None, :, :]            # (N, 27, 3)
        cell = jnp.clip(cell, 0, res - 1)
        w = (w_ax[:, offs[:, 0], 0] * w_ax[:, offs[:, 1], 1]
             * w_ax[:, offs[:, 2], 2])                        # (N, 27)
        dpos = (offs[None].astype(dtype) - fx[:, None, :]) * dx  # (N, 27, 3)

        flat = (cell[..., 0] * res + cell[..., 1]) * res + cell[..., 2]
        ncell = res ** 3
        mom_p = (m[:, None, None] * v[:, None, :]
                 + jnp.einsum("nij,nkj->nki", affine, dpos))  # (N, 27, 3)
        grid_mom = jax.ops.segment_sum(
            (w[..., None] * mom_p).reshape(-1, 3), flat.reshape(-1), ncell)
        grid_mass = jax.ops.segment_sum(
            (w * m[:, None]).reshape(-1), flat.reshape(-1), ncell)

        # --- grid update ---
        w_idx = np.maximum(model.structure.particle_world, 0)
        g_vec = jnp.mean(model.gravity[w_idx], axis=0)  # grid-level gravity
        gv = grid_mom / jnp.maximum(grid_mass, 1e-10)[:, None]
        gv = gv + dt * g_vec[None, :]
        gv = jnp.where((grid_mass > 1e-10)[:, None], gv, 0.0)
        # boundary conditions: zero normal velocity at grid walls (3 cells)
        ii = jnp.arange(res)
        gx3, gy3, gz3 = jnp.meshgrid(ii, ii, ii, indexing="ij")
        gxf = gx3.reshape(-1)
        gyf = gy3.reshape(-1)
        gzf = gz3.reshape(-1)
        bound = 3
        gv = gv.at[:, 0].set(jnp.where(
            ((gxf < bound) & (gv[:, 0] < 0)) | ((gxf >= res - bound) & (gv[:, 0] > 0)),
            0.0, gv[:, 0]))
        gv = gv.at[:, 1].set(jnp.where(
            ((gyf < bound) & (gv[:, 1] < 0)) | ((gyf >= res - bound) & (gv[:, 1] > 0)),
            0.0, gv[:, 1]))
        gv = gv.at[:, 2].set(jnp.where(
            ((gzf < bound) & (gv[:, 2] < 0)) | ((gzf >= res - bound) & (gv[:, 2] > 0)),
            0.0, gv[:, 2]))

        # --- G2P ---
        gv_n = gv[flat]                                      # (N, 27, 3)
        v_new = jnp.einsum("nk,nkx->nx", w, gv_n)
        C_new = 4.0 * inv_dx * inv_dx * jnp.einsum(
            "nk,nkx,nky->nxy", w, gv_n, dpos)
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
        return state_in.replace(particle_q=x_new, particle_qd=v_new,
                                custom=custom)


SolverMPM = SolverImplicitMPM


def _svd3(F):
    """Batched 3x3 SVD with sign correction (proper rotations)."""
    U, s, Vt = jnp.linalg.svd(F)
    det_u = jnp.linalg.det(U)
    det_v = jnp.linalg.det(Vt)
    U = U.at[:, :, 2].multiply(jnp.sign(det_u)[:, None])
    Vt = Vt.at[:, 2, :].multiply(jnp.sign(det_v)[:, None])
    s = s.at[:, 2].multiply(jnp.sign(det_u * det_v))
    return U, s, Vt


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
